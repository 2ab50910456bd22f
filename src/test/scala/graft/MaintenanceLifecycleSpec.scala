package graft

import graft.operators.{AtomicIncrement, BloomSkip, Cdc, IncrementalAgg, Maintenance}
import graft.streaming.MergeStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The full steady-state loop under ONE spec: N CDC micro-batches
  * stream through the copy-on-write merge + retractable rollup, with
  * OPTIMIZE → bloom re-cover → vacuum maintenance passes interleaved —
  * and at every checkpoint the table equals the read-side resolve of
  * the whole feed, the rollup equals re-aggregating the table, point
  * lookups stay no-false-negative AND prune again after each rewrite,
  * and the on-disk file set is exactly the committed snapshot (churn
  * debris reclaimed, nothing live touched). This is the composition
  * the pieces' own specs can't see: merge → maintain → merge again.
  */
class MaintenanceLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).resolve("d").toString

  private def base = (1L to 60L).map(k => (k, s"g${k % 3}", k * 2.0))
    .toDF("k", "g", "x")

  private def tableRows(sink: String) =
    AtomicIncrement.readCommitted(spark, sink)
      .select("k", "g", "x").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq

  private def stateRows(sink: String) =
    IncrementalAgg.readState(spark, sink)
      .select("g", "__n", "sum_x")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  /** On-disk data files under _data vs the committed manifest. */
  private def diskVsCommitted(sink: String): (Set[String], Set[String]) = {
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataRoot = new org.apache.hadoop.fs.Path(s"$sink/_data")
    val onDisk = fs.listStatus(dataRoot).flatMap(d =>
      fs.listStatus(d.getPath).map(_.getPath))
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .map(p => s"_data/${p.getParent.getName}/${p.getName}").toSet
    (onDisk, AtomicIncrement.committedFiles(spark, sink).toSet)
  }

  test("merge-stream → optimize → bloom re-cover → vacuum, twice over: " +
      "table ≡ feed resolve, rollup ≡ re-agg, lookups exact and " +
      "pruning, disk ≡ committed snapshot") {
    val tableSink = tmp("graft_life_t")
    val stateSink = tmp("graft_life_s")
    // key-clustered load (3 range files) + rollup bootstrap at −1
    for (r <- Seq(1L to 20L, 21L to 40L, 41L to 60L))
      AtomicIncrement.appendIncrementAtomic(
        base.filter(col("k").between(r.head, r.last)).repartition(1),
        tableSink, "k")
    IncrementalAgg.mergeCdcBatch(base, base.limit(0), stateSink,
      Seq("g"), Seq("x"), -1L)
    BloomSkip.ensureSidecars(spark, tableSink, "k")

    // the CDC feed, four micro-batches: updates, deletes, inserts,
    // a revival — churn scattered enough that merges interleave the
    // key space and OPTIMIZE has real work to do
    val feed: Seq[Seq[(Long, String, Double, Long, Boolean)]] = Seq(
      Seq((5L, "g9", 100.0, 1L, false), (45L, "", 0.0, 1L, true)),
      Seq((61L, "gN", 500.0, 1L, false), (22L, "g9", 200.0, 1L, false)),
      Seq((45L, "g9", 700.0, 2L, false), (8L, "", 0.0, 1L, true)),
      Seq((30L, "g9", 900.0, 1L, false), (61L, "", 0.0, 2L, true)))
    def applyBatch(i: Int): Unit = {
      val changes = feed(i).toDF("k", "g", "x", "v", "del")
      MergeStream.applyBatchStep(changes, i.toLong, tableSink,
        "k", "v", "del", Some(stateSink), Seq("g"), Seq("x"))
    }
    def expectedAfter(n: Int) = {
      val changes = feed.take(n).zipWithIndex.flatMap { case (b, i) =>
        b.map { case (k, g, x, v, del) =>
          // per-key version must be globally monotone across batches
          // for the reference resolve: scale by batch index
          (k, g, x, (i + 1) * 10L + v, del) }
      }.toDF("k", "g", "x", "v", "del")
      val all = base.select(col("k"), col("g"), col("x"),
        lit(0L).as("v"), lit(false).as("del")).unionByName(changes)
      Cdc.latestView(all, Seq("k"), "v", "del")
        .select("k", "g", "x").as[(Long, String, Double)]
        .collect().sortBy(_._1).toSeq
    }
    // targetFiles BELOW the base file count so the fragmentation
    // trigger always fires in this fixture (merge churn keeps the
    // committed count above it) — the trigger itself has its own test
    val target = Maintenance.Target(tableSink, clusterCols = Seq("k"),
      bloomCols = Seq("k"), targetFiles = 2)

    def checkpoint(nBatches: Int, label: String): Unit = {
      assert(tableRows(tableSink) == expectedAfter(nBatches),
        s"$label: table diverged from the feed resolve")
      val direct = AtomicIncrement.readCommitted(spark, tableSink)
        .groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(stateRows(stateSink) == direct,
        s"$label: rollup diverged from re-aggregation")
      // point lookups: exact everywhere, pruning engaged
      val live = tableRows(tableSink).map(_._1)
      for (k <- live.take(3) ++ live.takeRight(3) :+ 99999L)
        assert(BloomSkip.pointLookup(spark, tableSink, "k", lit(k))
          .filter(col("k") === k).count() ==
          (if (live.contains(k)) 1L else 0L),
          s"$label: lookup wrong for k=$k")
      assert(BloomSkip.pointLookup(spark, tableSink, "k", lit(live.head))
        .inputFiles.length <
        AtomicIncrement.committedFiles(spark, tableSink).size,
        s"$label: bloom pruning dead")
      // disk bounded: data files on disk == the committed snapshot
      val (disk, committed) = diskVsCommitted(tableSink)
      assert(disk == committed,
        s"$label: disk drifted from the snapshot — " +
          s"extra=${disk -- committed}, missing=${committed -- disk}")
    }

    applyBatch(0); applyBatch(1)
    val r1 = Maintenance.maintainAtomic(spark, target)
    assert(r1.rewrote && r1.filesAfter == 2 && r1.sidecarsBuilt == 2,
      s"first maintenance pass: $r1")
    checkpoint(2, "after first maintain")
    // maintenance must not break the fold's replay shield: batch ids
    // continue past it
    applyBatch(2); applyBatch(3)
    val r2 = Maintenance.maintainAtomic(spark, target)
    checkpoint(4, "after second maintain")
    assert(r2.supersededRemoved + r2.orphanDirsRemoved > 0,
      s"churn left nothing to reclaim — fixture too tame: $r2")
    // a further confined merge after maintenance still prunes: the
    // clustered rewrite restored the intervals
    val res = AtomicIncrement.mergeAtomic(
      Seq((2L, "g9", 1.0, false)).toDF("k", "g", "x", "del"),
      tableSink, "k", "del")
    assert(res.carried > 0, s"post-maintenance merge lost pruning: $res")
  }

  test("fragmentation trigger: a healthy table's maintenance pass " +
      "skips the rewrite (no new version, no byte movement) while " +
      "sidecar cover and vacuums still run") {
    val sink = tmp("graft_trig")
    for (r <- Seq(1L to 30L, 31L to 60L))
      AtomicIncrement.appendIncrementAtomic(
        base.filter(col("k").between(r.head, r.last)).repartition(1),
        sink, "k")
    val target = Maintenance.Target(sink, clusterCols = Seq("k"),
      bloomCols = Seq("k"), targetFiles = 8)
    val vBefore = AtomicIncrement.snapshot(spark, sink)._1
    val r = Maintenance.maintainAtomic(spark, target)
    assert(!r.rewrote && r.filesBefore == 2 && r.filesAfter == 2,
      s"healthy table was rewritten: $r")
    assert(AtomicIncrement.snapshot(spark, sink)._1 == vBefore,
      "a skipped rewrite must not publish a version")
    // the cheap halves still ran: full sidecar coverage, clean disk
    assert(r.sidecarsBuilt == 2)
    assert(Maintenance.maintainAtomic(spark, target).sidecarsBuilt == 0)
    // ...and once fragmentation crosses the trigger, the rewrite runs
    for (i <- 1 to 7)
      AtomicIncrement.appendIncrementAtomic(
        Seq((60L + i, "gZ", 1.0)).toDF("k", "g", "x").repartition(1),
        sink, "k")
    val r2 = Maintenance.maintainAtomic(spark, target)
    assert(r2.rewrote && r2.filesBefore == 9 && r2.filesAfter <= 8,
      s"fragmented table was not rewritten: $r2")
  }

  test("standing delete vectors are repaid by the TARGETED fold below " +
      "the fragmentation trigger — no full table rewrite, only the " +
      "masked file moves; the opt-out leaves the debt standing") {
    val sink = tmp("graft_dvfold")
    for (r <- Seq(1L to 30L, 31L to 60L))
      AtomicIncrement.appendIncrementAtomic(
        base.filter(col("k").between(r.head, r.last)).repartition(1),
        sink, "k")
    // triggerFiles high: fragmentation alone never fires in this test,
    // so every rewrite decision is PURELY the dv policy under test
    val target = Maintenance.Target(sink, targetFiles = 8,
      triggerFiles = 20)
    // healthy, no dvs: the pass skips the rewrite AND the fold
    val r0 = Maintenance.maintainAtomic(spark, target)
    assert(!r0.rewrote && r0.dvFoldedFiles == 0)
    // a merge-on-read delete leaves a tombstone over the FIRST file's
    // key range — the next pass repays it without a layout rewrite,
    // touching exactly the one masked file (the r13 policy rewrote
    // the whole snapshot here)
    AtomicIncrement.mergeOnReadAtomic(
      Seq((5L, "", 0.0, true)).toDF("k", "g", "x", "del"),
      sink, "k", "del")
    val secondFile = AtomicIncrement.committedFiles(spark, sink).toSet
    val r1 = Maintenance.maintainAtomic(spark, target)
    assert(!r1.rewrote, s"dv repayment ran a full table rewrite: $r1")
    assert(r1.dvFoldedFiles == 1,
      s"targeted fold must rewrite exactly the masked file: $r1")
    assert(AtomicIncrement.snapshotSplit(spark, sink)._3.isEmpty)
    assert(!AtomicIncrement.readCommitted(spark, sink)
      .select("k").as[Long].collect().contains(5L))
    // the unmasked file carried verbatim: its path survives the fold
    val after = AtomicIncrement.committedFiles(spark, sink).toSet
    assert(secondFile.intersect(after).nonEmpty,
      "the dv-free file should carry through the targeted fold")
    // opt-out: foldDvs = false leaves the debt standing
    AtomicIncrement.mergeOnReadAtomic(
      Seq((6L, "", 0.0, true)).toDF("k", "g", "x", "del"),
      sink, "k", "del")
    val r2 = Maintenance.maintainAtomic(spark, target.copy(foldDvs = false))
    assert(!r2.rewrote && r2.dvFoldedFiles == 0)
    assert(AtomicIncrement.snapshotSplit(spark, sink)._3.nonEmpty)
  }

  test("small-file policy (round 14): a below-trigger pass with " +
      "smallFileBytes bin-packs only the sub-threshold files — no " +
      "table rewrite, the big file carries, content invariant") {
    val sink = tmp("graft_smalltgt")
    AtomicIncrement.appendIncrementAtomic(
      base.repartition(1), sink, "k")
    for (k <- 61L to 64L)
      AtomicIncrement.appendIncrementAtomic(
        Seq((k, "gS", 1.0)).toDF("k", "g", "x").repartition(1), sink, "k")
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val big = AtomicIncrement.committedFiles(spark, sink).map(f =>
      f -> fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$sink/$f")).getLen)
      .maxBy(_._2)
    val n0 = AtomicIncrement.readCommitted(spark, sink).count()
    val r = Maintenance.maintainAtomic(spark, Maintenance.Target(sink,
      clusterCols = Seq("k"), targetFiles = 8, triggerFiles = 20,
      smallFileBytes = big._2))
    assert(!r.rewrote && r.smallCompacted == 4,
      s"small-file pass wrong shape: $r")
    assert(AtomicIncrement.committedFiles(spark, sink).contains(big._1),
      "the well-formed file did not carry through the small-file pass")
    assert(AtomicIncrement.readCommitted(spark, sink).count() == n0)
    // healthy again: the next pass packs nothing
    assert(Maintenance.maintainAtomic(spark, Maintenance.Target(sink,
      clusterCols = Seq("k"), targetFiles = 8, triggerFiles = 20,
      smallFileBytes = big._2)).smallCompacted == 0)
  }

  test("z-order layout policy: a Target with zorderCols rewrites " +
      "multi-dimensionally — pruning engages on both columns after " +
      "the pass, content preserved") {
    val sink = tmp("graft_ztgt")
    def rows(p: Long => Boolean) = (1L to 300L).filter(p)
      .map(k => (k, (k * 77L) % 300L, k * 1.0)).toDF("k", "c", "x")
    // 6 interleaved loads: past the trigger, nothing pruning-shaped
    for (r <- 0L to 5L)
      AtomicIncrement.appendIncrementAtomic(
        rows(_ % 6 == r).withColumn("b", lit(r)).repartition(1),
        sink, "b", extraStatsCols = Seq("k", "c"))
    val n0 = AtomicIncrement.readCommitted(spark, sink).count()
    // ≥4 target files so the z-curve's leading bits split BOTH dims
    val target = Maintenance.Target(sink, targetFiles = 4,
      zorderCols = Seq("k", "c"))
    val r = Maintenance.maintainAtomic(spark, target)
    assert(r.rewrote, s"z-order pass did not rewrite: $r")
    val total = AtomicIncrement.committedFiles(spark, sink).size
    for (c <- Seq("k", "c"))
      assert(AtomicIncrement.readCommittedAbove(spark, sink, c, 260L)
        .inputFiles.length < total, s"no pruning on $c after z-order")
    assert(AtomicIncrement.readCommitted(spark, sink).count() == n0)
  }

  test("token-sidecar lifecycle (round 14): the maintenance pass " +
      "re-covers text-search filters after a rewrite, and the grep " +
      "prunes again immediately") {
    import graft.operators.BloomSkip
    val sink = tmp("toklife")
    for (r <- Seq(Seq((1L, "alpha common"), (2L, "common only")),
        Seq((11L, "bravo common")), Seq((21L, "common again"))))
      AtomicIncrement.appendIncrementAtomic(
        r.toDF("k", "txt").repartition(1), sink, "k")
    val target = Maintenance.Target(sink, clusterCols = Seq("k"),
      targetFiles = 2, tokenBloomCols = Seq("txt"))
    // first pass: rewrite (3 files > 2 target) + fresh token cover
    val r1 = Maintenance.maintainAtomic(spark, target)
    assert(r1.rewrote && r1.tokenSidecarsBuilt ==
      AtomicIncrement.committedFiles(spark, sink).size,
      s"rewrite must leave every new file to re-cover: $r1")
    val narrowed = BloomSkip.readContainingTokens(spark, sink, "txt",
      Seq("bravo"))
    assert(narrowed.inputFiles.length <
      AtomicIncrement.committedFiles(spark, sink).size,
      "token pruning did not re-engage after the rewrite")
    assert(narrowed.filter(col("txt").contains("bravo"))
      .select("k").as[Long].collect().toSeq == Seq(11L))
    // healthy second pass: nothing to rebuild
    val r2 = Maintenance.maintainAtomic(spark, target.copy(
      triggerFiles = 100))
    assert(!r2.rewrote && r2.tokenSidecarsBuilt == 0, s"$r2")
  }
}
