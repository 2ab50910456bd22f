package graft

import graft.sources.{Layout, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Plan-shape proofs for the 100 TB layout conventions: partition
  * pruning on date-partitioned facts, exchange-free bucketed joins.
  */
class LayoutSpec extends SparkSpec {

  test("date-partitioned facts prune partitions on time filters") {
    val dir = Files.createTempDirectory("graft_layout").resolve("orders").toString
    val o = Tables.table(spark, sfDir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Layout.writePartitioned(o, dir, "order_year")
    val scan = spark.read.parquet(dir).filter(col("order_year") === 1997)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // the pruned scan reads strictly fewer files than the full scan
    val all = spark.read.parquet(dir)
    assert(scan.count() > 0)
    assert(scan.count() < all.count())
  }

  test("bucketed tables join without an exchange on either side") {
    // disable broadcast so the test proves bucket co-location, not
    // broadcast avoidance (at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def bucketedJoinBody(): Unit = {
    Layout.writeBucketed(
      Tables.table(spark, sfDir, "orders").select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", numBuckets = 4)
    Layout.writeBucketed(
      Tables.table(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", numBuckets = 4)
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() > 0)
  }
}
