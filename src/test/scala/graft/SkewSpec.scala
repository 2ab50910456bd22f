package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Salted join: result parity with the plain equi-join on a skewed key
  * distribution, and deterministic salting (no rand()).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on skewed data") {
    // 90% of probe rows share one hot key
    val probe = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong else 7L, s"row_$i")).toDF("k", "payload")
    val build = (1 to 50).map(i => (i.toLong, i * 1.5)).toDF("k", "weight")
    val plain = probe.join(build, Seq("k"))
      .select("k", "payload", "weight")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedEquiJoin(probe, build, "k", factor = 8)
      .select("k", "payload", "weight")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salting is deterministic across evaluations") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity").limit(500)
    val sup = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val a = Skew.saltedEquiJoin(li, sup, "l_orderkey").count()
    val b = Skew.saltedEquiJoin(li, sup, "l_orderkey").count()
    assert(a == b && a > 0)
  }
}
