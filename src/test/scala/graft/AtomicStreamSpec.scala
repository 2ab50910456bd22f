package graft

import graft.operators.AtomicIncrement
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming SOURCE face (`spark.readStream.format("graft-atomic")`):
  * offsets are manifest versions, each micro-batch one change-feed
  * window. The suite drives appends + a copy-on-write merge + a
  * merge-on-read commit through a real streaming query and pins that
  * a foreachBatch fold lands on EXACTLY the batch resolve, that
  * restart resumes from the checkpointed version offset (no duplicate
  * bootstrap), and that append-only mode refuses delete-carrying
  * windows loudly.
  */
class AtomicStreamSpec extends SparkSpec {
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
    (lo to hi).map(k => (k.toLong, s"g${k % 3}", k * 1.5))
      .toDF("k", "grp", "amt")

  /** Fold one micro-batch's signed delta into `state`: per group,
    * inserts add (n, amt), deletes subtract — the abelian consumer
    * the feed's multiset-delta contract is designed for.
    */
  private def fold(state: scala.collection.concurrent.TrieMap[
      String, (Long, Double)])(batch: DataFrame): Unit =
    batch.groupBy("grp").agg(
      sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("dn"),
      sum(when(col("_change_type") === "insert", col("amt"))
        .otherwise(-col("amt"))).as("ds")).collect().foreach { r =>
      val (n0, s0) = state.getOrElse(r.getString(0), (0L, 0.0))
      state.put(r.getString(0), (n0 + r.getLong(1), s0 + r.getDouble(2)))
      ()
    }

  private def expected(sink: String): Map[String, (Long, Double)] =
    AtomicIncrement.readCommitted(spark, sink).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("amt").as("s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def assertFoldMatches(
      state: scala.collection.concurrent.TrieMap[String, (Long, Double)],
      sink: String): Unit = {
    val want = expected(sink)
    val got = state.toMap.filter { case (_, (n, _)) => n != 0L }
    assert(got.keySet === want.keySet)
    for ((g, (n, s)) <- got) {
      assert(n === want(g)._1, s"group $g count")
      assert(math.abs(s - want(g)._2) < 1e-6, s"group $g sum")
    }
  }

  private def ch(df: DataFrame, del: Boolean): DataFrame =
    df.withColumn("del", lit(del))

  test("cdf stream folds appends + CoW merge + MoR commit to the " +
      "batch resolve, one version per micro-batch") {
    val sink = tmp("graft_stream_cdf")
    val ckpt = tmp("graft_stream_ckpt")
    try {
      AtomicIncrement.appendIncrementAtomic(rows(1, 40), sink, "k")
      AtomicIncrement.appendIncrementAtomic(rows(41, 80), sink, "k")
      AtomicIncrement.appendIncrementAtomic(rows(81, 120), sink, "k")
      // v4, copy-on-write: re-price k%10==0 into group gX, delete k%10==7
      AtomicIncrement.mergeAtomic(
        ch(rows(1, 120).filter($"k" % 10 === 0)
          .withColumn("grp", lit("gX"))
          .withColumn("amt", $"amt" + 100), del = false)
          .unionByName(ch(rows(1, 120).filter($"k" % 10 === 7),
            del = true)),
        sink, "k", "del")
      // v5, merge-on-read: upsert k%10==3 into gY, defer-delete k%10==1
      AtomicIncrement.mergeOnReadAtomic(
        ch(rows(1, 120).filter($"k" % 10 === 3)
          .withColumn("grp", lit("gY"))
          .withColumn("amt", $"amt" + 50), del = false)
          .unionByName(ch(rows(1, 120).filter($"k" % 10 === 1),
            del = true)),
        sink, "k", "del")
      val state =
        scala.collection.concurrent.TrieMap[String, (Long, Double)]()
      val versionsSeen = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.format("graft-atomic")
        .option("path", sink).option("maxVersionsPerBatch", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          val vs = df.select("_commit_version").distinct()
            .collect().map(_.getLong(0))
          versionsSeen ++= vs
          fold(state)(df)
        }.start()
      q.awaitTermination()
      // one window per manifest version, in order — the cap is real
      assert(versionsSeen.toList === List(1L, 2L, 3L, 4L, 5L))
      assertFoldMatches(state, sink)

      // restart from the checkpoint: ONE new append arrives alone —
      // no duplicate bootstrap, no replayed windows
      AtomicIncrement.appendIncrementAtomic(rows(121, 150), sink, "k")
      versionsSeen.clear()
      val q2 = spark.readStream.format("graft-atomic")
        .option("path", sink).option("maxVersionsPerBatch", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          versionsSeen ++= df.select("_commit_version").distinct()
            .collect().map(_.getLong(0))
          fold(state)(df)
        }.start()
      q2.awaitTermination()
      assert(versionsSeen.toList === List(6L))
      assertFoldMatches(state, sink)
    } finally { rm(sink); rm(ckpt) }
  }

  test("uncapped stream bootstraps the whole table in one window and " +
      "a catch-up run is a no-op") {
    val sink = tmp("graft_stream_boot")
    val ckpt = tmp("graft_stream_bckpt")
    try {
      AtomicIncrement.appendIncrementAtomic(rows(1, 50), sink, "k")
      AtomicIncrement.appendIncrementAtomic(rows(51, 90), sink, "k")
      val state =
        scala.collection.concurrent.TrieMap[String, (Long, Double)]()
      var batches = 0
      def run(): Unit = {
        val q = spark.readStream.format("graft-atomic")
          .option("path", sink).load()
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            batches += 1
            fold(state)(df)
          }.start()
        q.awaitTermination()
      }
      run()
      assert(batches === 1) // 0 -> v2 in one bootstrap window
      assertFoldMatches(state, sink)
      run() // nothing new: no batch fires at all
      assert(batches === 1)
      assertFoldMatches(state, sink)
    } finally { rm(sink); rm(ckpt) }
  }

  test("data-sized admission: a bulk version batches ALONE (the " +
      "single-version floor) and small neighbors coalesce under the " +
      "file cap") {
    val sink = tmp("graft_stream_bulk")
    val ckpt = tmp("graft_stream_bulkck")
    try {
      // v1 = one small commit, v2 = a BULK backfill (8 files),
      // v3..v4 = small again — under maxFilesPerBatch=4 the bulk
      // version must not drag its neighbors into its micro-batch
      AtomicIncrement.appendIncrementAtomic(
        rows(1, 10).repartition(1), sink, "k")
      AtomicIncrement.appendIncrementAtomic(
        rows(11, 90).repartition(8), sink, "k")
      AtomicIncrement.appendIncrementAtomic(
        rows(91, 95).repartition(1), sink, "k")
      AtomicIncrement.appendIncrementAtomic(
        rows(96, 99).repartition(1), sink, "k")
      val windows = scala.collection.mutable.ArrayBuffer[Long]()
      val state =
        scala.collection.concurrent.TrieMap[String, (Long, Double)]()
      val q = spark.readStream.format("graft-atomic")
        .option("path", sink).option("maxFilesPerBatch", "4").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          val d = df.cache()
          windows += d.agg(max("_commit_version")).head().getLong(0)
          fold(state)(d)
          d.unpersist()
          ()
        }.start()
      q.awaitTermination()
      // (0,1] fits (1 file < 4, window still open but v2 won't fit),
      // (1,2] = the bulk alone (floor), (2,4] = the two small ones
      assert(windows.toSeq === Seq(1L, 2L, 4L),
        s"window ends were ${windows.toSeq}")
      assertFoldMatches(state, sink)
      // the BYTE cap degenerate case: a 1-byte budget forces every
      // version to batch alone via the single-version floor
      val ckpt2 = tmp("graft_stream_bulkck2")
      try {
        val w2 = scala.collection.mutable.ArrayBuffer[Long]()
        val q2 = spark.readStream.format("graft-atomic")
          .option("path", sink).option("maxBytesPerBatch", "1").load()
          .writeStream.option("checkpointLocation", ckpt2)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            w2 += df.agg(max("_commit_version")).head().getLong(0)
            ()
          }.start()
        q2.awaitTermination()
        assert(w2.toSeq === Seq(1L, 2L, 3L, 4L),
          s"byte-capped window ends were ${w2.toSeq}")
      } finally rm(ckpt2)
    } finally { rm(sink); rm(ckpt) }
  }

  test("append-only mode streams appends and refuses a merge window " +
      "loudly") {
    val sink = tmp("graft_stream_ao")
    val ckpt = tmp("graft_stream_aockpt")
    try {
      AtomicIncrement.appendIncrementAtomic(rows(1, 30), sink, "k")
      AtomicIncrement.appendIncrementAtomic(rows(31, 60), sink, "k")
      val state =
        scala.collection.concurrent.TrieMap[String, (Long, Double)]()
      def run(): Unit = {
        val q = spark.readStream.format("graft-atomic")
          .option("path", sink).option("mode", "append-only").load()
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, _: Long) =>
            assert(df.filter(col("_change_type") =!= "insert").isEmpty)
            fold(state)(df)
          }.start()
        q.awaitTermination()
      }
      run()
      assertFoldMatches(state, sink)
      // a copy-on-write merge rewrites files: the next window is NOT
      // append-only and the stream must fail loudly, not drop deletes
      AtomicIncrement.mergeAtomic(
        ch(rows(1, 60).filter($"k" % 7 === 0), del = true),
        sink, "k", "del")
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(err).exists(c =>
        c.isInstanceOf[IllegalArgumentException] &&
          c.getMessage.contains("NOT append-only")),
        s"wrong failure: $err")
    } finally { rm(sink); rm(ckpt) }
  }

  test("stream schema is the table schema plus the two change columns " +
      "and subscribing to a missing table refuses") {
    val sink = tmp("graft_stream_schema")
    try {
      AtomicIncrement.appendIncrementAtomic(rows(1, 5), sink, "k")
      val df = spark.readStream.format("graft-atomic")
        .option("path", sink).load()
      assert(df.schema.fieldNames.toSeq ===
        Seq("k", "grp", "amt", "_change_type", "_commit_version"))
      assert(df.isStreaming)
      val missing = tmp("graft_stream_none")
      try {
        val e = intercept[Exception] {
          spark.readStream.format("graft-atomic")
            .option("path", missing).load()
        }
        assert(e.getMessage.contains("EXISTING table") ||
          Option(e.getCause).exists(_.getMessage.contains("EXISTING table")))
      } finally rm(missing)
    } finally rm(sink)
  }
}
