package graft

import graft.operators.{AtomicIncrement, BloomSkip}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bloom sidecar file skipping: no false negatives ever, lookups
  * ≡ full scan + filter in every sidecar state (covered, partially
  * covered, missing, post-compaction), pruning actually engages, and
  * the build is idempotent and increment-local.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_bloomskip").resolve("sink").toString

  private def fs(sink: String) =
    new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // three single-file increments clustered on ts, with ids SHUFFLED
  // across them (id = ts * 7919 % 3000 is a bijection-ish scatter) so
  // interval stats on ts can never answer an id lookup
  private def load(sink: String): Unit =
    for (r <- Seq(1L to 1000L, 1001L to 2000L, 2001L to 3000L))
      AtomicIncrement.appendIncrementAtomic(
        r.map(ts => (ts, ts * 7919 % 3000, s"v$ts")).toDF("ts", "id", "v")
          .repartition(1), sink, "ts")

  private def lookupRows(sink: String, id: Long) =
    BloomSkip.pointLookup(spark, sink, "id", lit(id))
      .filter(col("id") === id)
      .select("ts", "v").as[(Long, String)].collect().sorted.toSeq

  private def fullRows(sink: String, id: Long) =
    AtomicIncrement.readCommitted(spark, sink)
      .filter(col("id") === id)
      .select("ts", "v").as[(Long, String)].collect().sorted.toSeq

  test("no false negatives over the whole key domain; lookups prune to " +
      "fewer files; absent keys read zero files but keep the schema") {
    val sink = tmp()
    load(sink)
    assert(BloomSkip.ensureSidecars(spark, sink, "id") == 3)
    // EVERY present key must come back identical to the full scan —
    // a single false negative breaks the may-contain contract
    for (id <- 0L until 3000L by 97L)
      assert(lookupRows(sink, id) == fullRows(sink, id),
        s"lookup diverged for id=$id")
    // ids land in one increment each, so a lookup opens strictly
    // fewer files than the snapshot (usually exactly one)
    val some = BloomSkip.pointLookup(spark, sink, "id", lit(7919L % 3000L))
    assert(some.inputFiles.length < 3,
      s"bloom never pruned: ${some.inputFiles.length} files")
    // a key outside the domain: all sidecars reject (up to the ~1%
    // fp), the frame still carries the full schema and zero rows
    val none = BloomSkip.pointLookup(spark, sink, "id", lit(999999L))
    assert(none.columns.toSeq == Seq("ts", "id", "v"))
    assert(none.filter(col("id") === 999999L).count() == 0)
  }

  test("build is idempotent and increment-local; a missing sidecar " +
      "degrades to may-contain, never to a wrong answer") {
    val sink = tmp()
    load(sink)
    assert(BloomSkip.ensureSidecars(spark, sink, "id") == 3)
    assert(BloomSkip.ensureSidecars(spark, sink, "id") == 0,
      "re-ensure must build nothing")
    // a new increment: only ITS file needs a sidecar
    AtomicIncrement.appendIncrementAtomic(
      Seq((3001L, 42L, "fresh")).toDF("ts", "id", "v").repartition(1),
      sink, "ts")
    assert(BloomSkip.ensureSidecars(spark, sink, "id") == 1)
    // delete one sidecar: its file is may-contain (always read), and
    // results stay exactly equal to the full scan
    val victim = AtomicIncrement.committedFiles(spark, sink).head
    assert(fs(sink).delete(
      new org.apache.hadoop.fs.Path(s"$sink/$victim.bloom-id"), false))
    for (id <- Seq(42L, 7919L % 3000L, 999999L))
      assert(lookupRows(sink, id) == fullRows(sink, id))
    // the uncovered file is read by every lookup now (may-contain)
    val probe = BloomSkip.pointLookup(spark, sink, "id", lit(999999L))
    assert(probe.inputFiles.exists(_.contains(victim.split("/").last)),
      "sidecar-less file was skipped — that is a potential false negative")
  }

  test("compaction invalidates nothing silently: new files simply lack " +
      "sidecars (may-contain) until ensure covers them again") {
    val sink = tmp()
    load(sink)
    BloomSkip.ensureSidecars(spark, sink, "id")
    AtomicIncrement.compact(spark, sink, numFiles = 2)
    // rewritten files have no sidecars: lookups read them all, answers
    // unchanged
    val id = 7919L % 3000L
    assert(lookupRows(sink, id) == fullRows(sink, id))
    // re-ensure builds exactly the compacted files' sidecars, and
    // pruning engages again
    val built = BloomSkip.ensureSidecars(spark, sink, "id")
    assert(built == AtomicIncrement.committedFiles(spark, sink).size)
    assert(BloomSkip.pointLookup(spark, sink, "id", lit(999999L))
      .inputFiles.length <
      AtomicIncrement.committedFiles(spark, sink).size,
      "re-ensured sidecars never pruned the absent key")
    assert(lookupRows(sink, id) == fullRows(sink, id))
  }
}
