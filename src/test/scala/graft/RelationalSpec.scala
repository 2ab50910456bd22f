package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Relational extensions without a deterministic oracle: the HLL
  * sketch bound, and plan-shape checks for the core query set.
  */
class RelationalSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per group") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.02).as("approx"),
        countDistinct("l_partkey").as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("q1_agg plan: partial then final hash aggregation, no sort before agg") {
    val plan = SparkEntry.queries("q1_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(plan.split("HashAggregate").length >= 3) // partial + final
  }

  test("q_join_left plan: dimension side is broadcast") {
    val plan = SparkEntry.queries("q_join_left")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q_filter_prefix plan: predicate pushed to the parquet scan") {
    val plan = SparkEntry.queries("q_filter_prefix")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(p_type), StringStartsWith(p_type,STANDARD)]"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }
}
