package graft

import graft.operators.AtomicIncrement
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming SINK face (`writeStream.format("graft-atomic")`):
  * append mode = watermarked increments whose replay shield IS the
  * watermark, update mode = per-batch copy-on-write merges with an
  * OCC bootstrap, complete mode = snapshot replaces — plus the
  * end-to-end replication loop (source face → sink face) and the
  * catalog's SQL time travel.
  */
class AtomicStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  test("append mode lands micro-batches as watermarked increments and " +
      "a re-delivered batch filters to zero") {
    val sink = tmp("graft_ssink_app")
    val ck1 = tmp("graft_ssink_ck1")
    val ck2 = tmp("graft_ssink_ck2")
    try {
      val mem = MemoryStream[(Long, String, Double)](spark)
      def run(ckpt: String): Unit = {
        val q = mem.toDF().toDF("k", "grp", "amt")
          .writeStream.format("graft-atomic")
          .option("path", sink).option("watermarkCol", "k")
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      mem.addData((1 to 50).map(i => (i.toLong, s"g${i % 3}", i * 1.0)))
      run(ck1)
      mem.addData((51 to 80).map(i => (i.toLong, s"g${i % 3}", i * 1.0)))
      run(ck1)
      assert(AtomicIncrement.readCommitted(spark, sink).count() === 80L)
      // a FRESH checkpoint re-delivers everything: the watermark
      // contract filters every row and publishes nothing
      val v0 = AtomicIncrement.snapshot(spark, sink)._1
      run(ck2)
      assert(AtomicIncrement.snapshot(spark, sink)._1 === v0)
      assert(AtomicIncrement.readCommitted(spark, sink).count() === 80L)
    } finally { rm(sink); rm(ck1); rm(ck2) }
  }

  test("append mode surfaces late rows: failOnLateRows=true fails the " +
      "batch instead of silently dropping out-of-order event times") {
    val sink = tmp("graft_ssink_late")
    val ckpt = tmp("graft_ssink_lck")
    try {
      val mem = MemoryStream[(Long, Double)](spark)
      def run(fail: Boolean): Unit = {
        val q = mem.toDF().toDF("k", "amt")
          .writeStream.format("graft-atomic")
          .option("path", sink).option("watermarkCol", "k")
          .option("failOnLateRows", fail.toString)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      mem.addData((1 to 50).map(i => (i.toLong, i * 1.0)))
      run(fail = true)
      // a batch mixing late (k ≤ 50) and fresh rows: the gate would
      // silently keep only the fresh ones — with failOnLateRows the
      // batch fails loudly BEFORE any commit
      mem.addData(Seq((10L, 99.0), (51L, 51.0)))
      val v0 = AtomicIncrement.snapshot(spark, sink)._1
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(fail = true)
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(c => c +: causes(c.getCause))
      assert(causes(ex).exists(c =>
        c.isInstanceOf[IllegalStateException] &&
          c.getMessage.contains("dropped 1 row")),
        s"expected the late-row failure, got: $ex")
      assert(AtomicIncrement.snapshot(spark, sink)._1 === v0,
        "the failed batch must publish nothing")
      // default mode: the same batch drops the late row (logged) and
      // commits the fresh one — replay-dedup semantics preserved
      run(fail = false)
      val got = AtomicIncrement.readCommitted(spark, sink)
      assert(got.count() === 51L)
      assert(got.filter($"k" === 10L).select("amt").as[Double]
        .head() === 10.0, "the late re-send of k=10 must not land")
    } finally { rm(sink); rm(ckpt) }
  }

  test("update mode bootstraps an empty sink then merges by key; " +
      "deletes ride the deleteCol") {
    val sink = tmp("graft_ssink_upd")
    val ckpt = tmp("graft_ssink_uck")
    try {
      val mem = MemoryStream[(Long, String, Double, Boolean)](spark)
      def run(): Unit = {
        val q = mem.toDF().toDF("k", "grp", "amt", "del")
          .writeStream.format("graft-atomic")
          .option("path", sink).option("keyCol", "k")
          .option("deleteCol", "del")
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update())
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      mem.addData((1 to 40).map(i => (i.toLong, s"g${i % 3}", i * 1.0,
        false)))
      run()
      // upsert 5, delete 3, insert 2 new
      mem.addData(Seq((1L, "gX", 1000.0, false), (2L, "gX", 1000.0, false),
        (3L, "gX", 1000.0, false), (4L, "gX", 1000.0, false),
        (5L, "gX", 1000.0, false), (10L, "", 0.0, true),
        (11L, "", 0.0, true), (12L, "", 0.0, true),
        (41L, "g0", 41.0, false), (42L, "g0", 42.0, false)))
      run()
      val now = AtomicIncrement.readCommitted(spark, sink)
      assert(now.count() === 39L) // 40 - 3 + 2
      assert(now.filter($"grp" === "gX").count() === 5L)
      assert(now.filter($"k".isin(10L, 11L, 12L)).count() === 0L)
      assert(!now.columns.contains("del") && !now.columns.contains("__gdel"))
    } finally { rm(sink); rm(ckpt) }
  }

  test("source face to sink face: row-level CDC replication " +
      "reproduces the upstream table exactly") {
    val a = tmp("graft_repl_a")
    val b = tmp("graft_repl_b")
    val ckpt = tmp("graft_repl_ck")
    try {
      // upstream: appends + CoW merge + MoR commit
      val rows = (1 to 90).map(i => (i.toLong, s"g${i % 3}", i * 2.0))
        .toDF("k", "grp", "amt")
      AtomicIncrement.appendIncrementAtomic(rows.filter($"k" <= 30), a, "k")
      AtomicIncrement.appendIncrementAtomic(
        rows.filter($"k" > 30 && $"k" <= 60), a, "k")
      AtomicIncrement.appendIncrementAtomic(rows.filter($"k" > 60), a, "k")
      AtomicIncrement.mergeAtomic(
        rows.filter($"k" % 10 === 0).withColumn("amt", $"amt" + 500)
          .withColumn("del", lit(false))
          .unionByName(rows.filter($"k" % 7 === 0)
            .withColumn("del", lit(true))),
        a, "k", "del")
      AtomicIncrement.mergeOnReadAtomic(
        rows.filter($"k" % 11 === 0).withColumn("grp", lit("gY"))
          .withColumn("del", lit(false)),
        a, "k", "del")
      def replicate(): Unit = {
        val q = spark.readStream.format("graft-atomic")
          .option("path", a).option("rowLevel", "true")
          .option("keyCol", "k").load()
          .filter(col("_change_type") =!= "update_preimage")
          .withColumn("del", col("_change_type") === "delete")
          .drop("_change_type", "_commit_version")
          .writeStream.format("graft-atomic")
          .option("path", b).option("keyCol", "k")
          .option("deleteCol", "del")
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update())
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      replicate()
      def sorted(sink: String) = AtomicIncrement
        .readCommitted(spark, sink).orderBy("k")
        .collect().toSeq.map(_.toSeq)
      assert(sorted(b) === sorted(a), "replica diverged after bootstrap")
      // more upstream churn, then an incremental catch-up
      AtomicIncrement.mergeAtomic(
        Seq((2L, "gZ", 9999.0, false), (4L, "", 0.0, true))
          .toDF("k", "grp", "amt", "del"), a, "k", "del")
      replicate()
      assert(sorted(b) === sorted(a), "replica diverged after catch-up")
      // idempotent: nothing new, nothing moves
      val vb = AtomicIncrement.snapshot(spark, b)._1
      replicate()
      assert(AtomicIncrement.snapshot(spark, b)._1 === vb)
    } finally { rm(a); rm(b); rm(ckpt) }
  }

  test("catalog SQL time travel: VERSION AS OF, tag names, and " +
      "TIMESTAMP AS OF resolve through the manifest; pinned DELETE " +
      "refuses") {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val sink = tmp("graft_cat_tt")
    try {
      val rows = (1 to 30).map(i => (i.toLong, i * 1.0)).toDF("k", "amt")
      AtomicIncrement.appendIncrementAtomic(rows.filter($"k" <= 10),
        sink, "k")
      AtomicIncrement.tagVersion(spark, sink, "first",
        AtomicIncrement.snapshot(spark, sink)._1, replace = false)
      AtomicIncrement.appendIncrementAtomic(
        rows.filter($"k" > 10 && $"k" <= 20), sink, "k")
      AtomicIncrement.appendIncrementAtomic(rows.filter($"k" > 20),
        sink, "k")
      def n(sql: String): Long =
        spark.sql(sql).collect().head.getLong(0)
      assert(n(s"SELECT count(*) FROM graft.`$sink`") === 30L)
      assert(n(s"SELECT count(*) FROM graft.`$sink` VERSION AS OF 2") === 20L)
      assert(n(s"SELECT count(*) FROM graft.`$sink` VERSION AS OF 'first'")
        === 10L)
      val nowIso = java.time.Instant.now().plusSeconds(60).toString
      assert(n(s"SELECT count(*) FROM graft.`$sink` " +
        s"TIMESTAMP AS OF '$nowIso'") === 30L)
      // Spark's grammar already refuses DELETE ... VERSION AS OF at
      // parse time; the table-level guard is the backstop for any
      // caller reaching deleteWhere on a pinned load directly
      val pinned = new graft.sources.GraftSqlTable(sink,
        Some(("versionAsOf", "2")))
      val e = intercept[IllegalArgumentException] {
        pinned.deleteWhere(Array(
          new org.apache.spark.sql.connector.expressions.filter.Predicate(
            "ALWAYS_TRUE",
            Array.empty[org.apache.spark.sql.connector.expressions.Expression])))
      }
      assert(e.getMessage.contains("immutable"))
    } finally rm(sink)
  }
}
