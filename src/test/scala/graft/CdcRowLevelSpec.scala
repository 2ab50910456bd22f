package graft

import graft.operators.AtomicIncrement
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The row-level change feed ([[AtomicIncrement.changesRowLevel]]):
  * minimal rows on a merge window (rewritten survivors telescope at
  * the source), CDF-style classification under a declared key, exact
  * multiset equivalence with the file-grained delta, and the
  * `rowLevel` streaming option.
  */
class CdcRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(k => (k.toLong, k * 2.0)).toDF("k", "amt")

  /** One CoW merge window over a 1..100 table: upsert 10 existing
    * keys (k%10==0 → amt+1000), insert 5 new (101..105), delete 7
    * (k%13==0).
    */
  private def mergedSink(): (String, Long, Long) = {
    val sink = tmp("graft_rowlevel")
    AtomicIncrement.appendIncrementAtomic(rows(1, 100), sink, "k")
    val from = AtomicIncrement.snapshot(spark, sink)._1
    val changes = rows(1, 100).filter($"k" % 10 === 0)
      .withColumn("amt", $"amt" + 1000).withColumn("del", lit(false))
      .unionByName(rows(101, 105).withColumn("del", lit(false)))
      .unionByName(rows(1, 100).filter($"k" % 13 === 0)
        .withColumn("del", lit(true)))
    AtomicIncrement.mergeAtomic(changes, sink, "k", "del")
    (sink, from, AtomicIncrement.snapshot(spark, sink)._1)
  }

  test("row-level feed ships minimal rows on a merge window and " +
      "equals the file-grained multiset delta") {
    val (sink, from, to) = mergedSink()
    try {
      val feed = AtomicIncrement.changesRowLevel(spark, sink, from, to)
      val plusRows = feed.filter($"_change_type" === "insert").drop("_change_type")
      val minusRows = feed.filter($"_change_type" === "delete").drop("_change_type")
      // MINIMAL: 10 upserts + 5 inserts on plus; the 10 pre-images +
      // 7 deletes (13, 26, 39, 52, 65, 78, 91) on minus — none of the
      // rewritten files' ~83 surviving rows ride either side
      assert(plusRows.count() === 15L)
      assert(minusRows.count() === 17L)
      // multiset equivalence with the file-grained frames
      val (p, m) = AtomicIncrement.changesBetween(spark, sink, from, to)
      assert(p.exceptAll(m).exceptAll(plusRows).isEmpty &&
        plusRows.exceptAll(p.exceptAll(m)).isEmpty)
      assert(m.exceptAll(p).exceptAll(minusRows).isEmpty &&
        minusRows.exceptAll(m.exceptAll(p)).isEmpty)
      // applying the row diff to the old snapshot reproduces the new
      val replayed = AtomicIncrement.readVersion(spark, sink, from)
        .unionByName(plusRows).exceptAll(minusRows)
      val now = AtomicIncrement.readVersion(spark, sink, to)
      assert(replayed.exceptAll(now).isEmpty && now.exceptAll(replayed).isEmpty)
    } finally rm(sink)
  }

  test("declared key classifies updates into pre/post image pairs") {
    val (sink, from, to) = mergedSink()
    try {
      val feed = AtomicIncrement.changesRowLevel(spark, sink, from, to,
        Some("k"))
      val byType = feed.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType === Map("insert" -> 5L, "delete" -> 7L,
        "update_preimage" -> 10L, "update_postimage" -> 10L))
      // every update key pairs a pre and a post image
      val pairs = feed.filter($"_change_type".startsWith("update"))
        .groupBy("k").count().collect()
      assert(pairs.forall(_.getLong(1) === 2L))
      // post-images carry the new values
      assert(feed.filter($"_change_type" === "update_postimage")
        .select("amt").as[Double].collect()
        .forall(_ > 1000.0))
    } finally rm(sink)
  }

  test("rowLevel streaming option ships classified minimal rows") {
    val (sink, _, _) = mergedSink()
    val ckpt = tmp("graft_rl_ckpt")
    try {
      val seen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      val q = spark.readStream.format("graft-atomic")
        .option("path", sink).option("rowLevel", "true")
        .option("keyCol", "k").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          seen ++= df.groupBy("_change_type").count().collect()
            .map(r => r.getString(0) -> r.getLong(1))
          ()
        }.start()
      q.awaitTermination()
      // bootstrap (0 -> v2) covers the resolved table: 98 rows alive
      val m = seen.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(m === Map("insert" -> 98L))
      // a fresh merge window then streams minimally
      AtomicIncrement.mergeAtomic(
        Seq((1L, 9999.0, false), (2L, 4.0, true)).toDF("k", "amt", "del"),
        sink, "k", "del")
      seen.clear()
      val q2 = spark.readStream.format("graft-atomic")
        .option("path", sink).option("rowLevel", "true")
        .option("keyCol", "k").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          seen ++= df.groupBy("_change_type").count().collect()
            .map(r => r.getString(0) -> r.getLong(1))
          ()
        }.start()
      q2.awaitTermination()
      val m2 = seen.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(m2 === Map("update_preimage" -> 1L,
        "update_postimage" -> 1L, "delete" -> 1L))
    } finally { rm(sink); rm(ckpt) }
  }
}
