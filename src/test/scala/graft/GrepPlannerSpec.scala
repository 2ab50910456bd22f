package graft

import graft.operators.{AtomicIncrement, BloomSkip}
import org.apache.spark.sql.functions._

/** The index-aware grep planner ([[BloomSkip.readGrep]], round 16):
  * one entry point picks sidecar probe vs inverted index by snapshot
  * size, index usability (bucket agreement), and coverage freshness —
  * pinned at each regime, with the RESULT identical to a full
  * scan + filter in all of them (the may-contain contract).
  */
class GrepPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  private def docs(lo: Int, hi: Int, needleAt: Int) =
    (lo to hi).map(i => (i.toLong,
      if (i == needleAt) "the xyzzy needle doc" else s"plain doc $i"))
      .toDF("doc_id", "text")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.filter(col("text").contains("xyzzy"))
      .select("doc_id").as[Long].collect().toSet

  test("small snapshot: sidecar probe even when an index exists") {
    val sink = tmp("graft_gp_small")
    try {
      AtomicIncrement.appendIncrementAtomic(
        docs(1, 200, 7).repartition(4), sink, "doc_id")
      BloomSkip.ensureTokenSidecars(spark, sink, "text")
      BloomSkip.ensureTokenIndex(spark, sink, "text")
      val got = ids(BloomSkip.readGrep(spark, sink, "text", Seq("xyzzy")))
      assert(BloomSkip.lastGrepChoice.get() === "sidecar-small")
      assert(got === Set(7L))
    } finally rm(sink)
  }

  test("large snapshot with a fresh index: the indexed plan; with a " +
      "bucket mismatch: the sidecar plan") {
    val sink = tmp("graft_gp_large")
    try {
      for (q <- 0 until 5)
        AtomicIncrement.appendIncrementAtomic(
          docs(q * 40 + 1, q * 40 + 40, 77).repartition(2),
          sink, "doc_id")
      BloomSkip.ensureTokenSidecars(spark, sink, "text")
      BloomSkip.ensureTokenIndex(spark, sink, "text")
      spark.conf.set(BloomSkip.GrepIndexThresholdConf, "4")
      try {
        val got = ids(BloomSkip.readGrep(spark, sink, "text",
          Seq("xyzzy")))
        assert(BloomSkip.lastGrepChoice.get() === "indexed")
        assert(got === Set(77L))
        // a probe asking for a different bucket count cannot use this
        // index — the planner falls back instead of refusing
        val got2 = ids(BloomSkip.readGrep(spark, sink, "text",
          Seq("xyzzy"), buckets = 1 << 12))
        assert(BloomSkip.lastGrepChoice.get() === "sidecar-noindex")
        assert(got2 === Set(77L))
      } finally spark.conf.unset(BloomSkip.GrepIndexThresholdConf)
    } finally rm(sink)
  }

  test("stale index (covers under half the snapshot): sidecar plan; " +
      "re-ensuring flips it back to indexed") {
    val sink = tmp("graft_gp_stale")
    try {
      AtomicIncrement.appendIncrementAtomic(
        docs(1, 40, 7).repartition(2), sink, "doc_id")
      BloomSkip.ensureTokenSidecars(spark, sink, "text")
      BloomSkip.ensureTokenIndex(spark, sink, "text")
      // appends since the last maintenance pass: 2 covered files of
      // 10 committed — keeping the uncovered tail conservatively
      // would read almost everything, so the planner probes instead
      for (q <- 1 until 5)
        AtomicIncrement.appendIncrementAtomic(
          docs(q * 40 + 1, q * 40 + 40, 177).repartition(2),
          sink, "doc_id")
      BloomSkip.ensureTokenSidecars(spark, sink, "text")
      spark.conf.set(BloomSkip.GrepIndexThresholdConf, "4")
      try {
        val got = ids(BloomSkip.readGrep(spark, sink, "text",
          Seq("xyzzy")))
        assert(BloomSkip.lastGrepChoice.get() === "sidecar-stale")
        assert(got === Set(7L, 177L))
        BloomSkip.ensureTokenIndex(spark, sink, "text")
        val got2 = ids(BloomSkip.readGrep(spark, sink, "text",
          Seq("xyzzy")))
        assert(BloomSkip.lastGrepChoice.get() === "indexed")
        assert(got2 === Set(7L, 177L))
      } finally spark.conf.unset(BloomSkip.GrepIndexThresholdConf)
    } finally rm(sink)
  }

  test("no index at all on a large snapshot: sidecar plan, result " +
      "still exact") {
    val sink = tmp("graft_gp_none")
    try {
      for (q <- 0 until 3)
        AtomicIncrement.appendIncrementAtomic(
          docs(q * 40 + 1, q * 40 + 40, 99).repartition(2),
          sink, "doc_id")
      BloomSkip.ensureTokenSidecars(spark, sink, "text")
      spark.conf.set(BloomSkip.GrepIndexThresholdConf, "4")
      try {
        val got = ids(BloomSkip.readGrep(spark, sink, "text",
          Seq("xyzzy")))
        assert(BloomSkip.lastGrepChoice.get() === "sidecar-noindex")
        assert(got === Set(99L))
      } finally spark.conf.unset(BloomSkip.GrepIndexThresholdConf)
    } finally rm(sink)
  }
}
