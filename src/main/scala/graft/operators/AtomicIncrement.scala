package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed incremental sink (SURVEY §7.5 #7's transactional
  * gap): `Incremental.appendIncrement` is idempotent on replay but a
  * crash mid-append exposes a partial file set to concurrent readers.
  * This layout closes that with a two-phase commit — the snapshot-
  * isolation core of the Delta/Iceberg commit protocol, without the
  * formats:
  *
  *  1. STAGE: the increment is written to `<sink>/_data/batch-<id>/`.
  *     `_data` is a hidden directory — plain `spark.read.parquet`,
  *     recursive listings, and footer-stats sweeps all skip it, so
  *     staged files are invisible everywhere until committed.
  *  2. PUBLISH: a new manifest version — the COMPLETE data-file list,
  *     prior snapshot plus the staged files, one relative path per
  *     line — is written to a temp name and RENAMEd to
  *     `_graft_manifest/<version>`. The rename is the commit point:
  *     readers resolve the highest version and read exactly its file
  *     list, so they see the old snapshot or the new one, never a
  *     partial append. (HDFS rename is atomic and fails on an
  *     existing destination; object stores need their atomic-commit
  *     primitive behind the same seam.)
  *
  * Crash anywhere before the rename → orphaned staged files the next
  * run ignores (its watermark comes from the committed snapshot, so
  * the delta is recomputed in full) and [[vacuumUncommitted]] GCs.
  * Concurrent writers: the loser's rename hits an existing version,
  * its staged batch is deleted, and it throws — re-run converges on
  * the winner's snapshot (optimistic concurrency, one winner per
  * version).
  *
  * At 100 TB: the manifest is O(files) lines of text, the watermark
  * stays a footer-stats read over the committed list, and data files
  * are never moved or rewritten — commit cost is one small-file write
  * + one rename regardless of data size.
  */
object AtomicIncrement {

  private val ManifestDir = "_graft_manifest"
  private val DataDir = "_data"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, manifest path) of the latest commit, if any. */
  private def latestManifest(fs: FileSystem, sink: String): Option[(Long, Path)] = {
    val dir = new Path(sink, ManifestDir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption.map(_ -> st.getPath))
      .sortBy(_._1).lastOption
  }

  /** (version, data-file paths relative to the sink root) of the
    * committed snapshot — (0, empty) before the first commit. The
    * version is the writer's optimistic-concurrency token: a commit
    * publishes at version+1 and fails if that version exists.
    */
  def snapshot(spark: SparkSession, sink: String): (Long, Seq[String]) = {
    val fs = fsOf(spark, sink)
    latestManifest(fs, sink) match {
      case None => (0L, Seq.empty)
      case Some((v, mf)) =>
        val in = fs.open(mf)
        try (v, scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList)
        finally in.close()
    }
  }

  /** Data-file paths (relative to the sink root) of the committed
    * snapshot — empty before the first commit.
    */
  def committedFiles(spark: SparkSession, sink: String): Seq[String] =
    snapshot(spark, sink)._2

  /** The committed snapshot as a DataFrame (mergeSchema over the
    * manifest's file list — schema evolution reads like
    * `Incremental.readEvolved`). Throws before the first commit.
    */
  def readCommitted(spark: SparkSession, sink: String): DataFrame = {
    val files = committedFiles(spark, sink)
    require(files.nonEmpty, s"no committed snapshot at $sink")
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$sink/$f"): _*)
  }

  /** Time travel: the snapshot EXACTLY as manifest `version` committed
    * it. Every manifest is immutable and lists its complete file set,
    * so any version remains readable until [[vacuumUncommitted]]
    * reclaims batch dirs the latest manifest no longer references —
    * the same manifest-retention trade as Delta/Iceberg time travel.
    */
  def readVersion(spark: SparkSession, sink: String,
      version: Long): DataFrame = {
    val fs = fsOf(spark, sink)
    val mf = new Path(new Path(sink, ManifestDir), f"$version%020d")
    require(fs.exists(mf), s"no manifest version $version at $sink")
    val in = fs.open(mf)
    val files =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$sink/$f"): _*)
  }

  /** Append rows with `watermarkCol` strictly above the committed
    * snapshot's max, atomically. Returns the appended row count.
    * Idempotent on replay; safe under concurrent readers at every
    * instant; throws `ConcurrentModificationException` (after
    * cleaning its staged files) if another writer commits first.
    */
  def appendIncrementAtomic(df: DataFrame, sink: String,
      watermarkCol: String): Long =
    appendWithHook(df, sink, watermarkCol, () => ())

  /** [[appendIncrementAtomic]] with a seam between stage and publish —
    * the spec injects a competing commit there to exercise the
    * optimistic-concurrency loss path deterministically.
    */
  private[graft] def appendWithHook(df: DataFrame, sink: String,
      watermarkCol: String, beforePublish: () => Unit): Long = {
    val spark = df.sparkSession
    val fs = fsOf(spark, sink)
    val resolved = df.schema.fields
      .find(_.name.equalsIgnoreCase(watermarkCol))
      .getOrElse(throw new IllegalArgumentException(
        s"watermark column '$watermarkCol' not in ${df.columns.mkString(",")}"))
    val (version, prior) = snapshot(spark, sink)
    val wmExpr =
      if (prior.isEmpty) None
      else Incremental.footerMaxOfFiles(spark,
          prior.map(f => new Path(s"$sink/$f")), resolved.name, resolved.dataType)
        .orElse(Option(readCommitted(spark, sink)
          .agg(max(watermarkCol)).head().get(0)).map(lit))
    val fresh = wmExpr match {
      case Some(w) => df.filter(col(watermarkCol) > w)
      case None => df
    }
    fresh.cache()
    try {
      val n = fresh.count()
      if (n > 0) {
        val staged = stageBatch(fresh, spark, fs, sink)
        try {
          beforePublish()
          publish(fs, sink, prior ++ staged, version + 1)
        } catch { case e: Throwable =>
          // failed commit must not leak half-staged state into a GC
          // race with the winner's readers — drop the whole batch dir
          staged.headOption.foreach(f =>
            fs.delete(new Path(s"$sink/$f").getParent, true))
          throw e
        }
      }
      n
    } finally { fresh.unpersist(); () }
  }

  /** Phase 1: write the increment under `_data/batch-<id>` and return
    * the new files' sink-relative paths. Package-visible so the spec
    * can crash-inject between stage and publish.
    */
  private[graft] def stageBatch(fresh: DataFrame, spark: SparkSession,
      fs: FileSystem, sink: String): Seq[String] = {
    val batch = s"$DataDir/batch-${java.util.UUID.randomUUID()}"
    fresh.write.parquet(s"$sink/$batch")
    fs.listStatus(new Path(s"$sink/$batch")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .sorted
      .map(n => s"$batch/$n")
  }

  /** Phase 2: atomically publish a manifest listing `files` at
    * exactly `version` (the writer's snapshot version + 1 — ANY
    * interleaved commit since the snapshot read collides here and
    * loses). The temp file is fully written and closed before the
    * rename, so no reader can observe a partial manifest.
    */
  private[graft] def publish(fs: FileSystem, sink: String,
      files: Seq[String], version: Long): Unit = {
    val dir = new Path(sink, ManifestDir)
    fs.mkdirs(dir)
    val target = new Path(dir, f"$version%020d")
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    // HDFS rename is atomic and refuses an existing destination; the
    // local FS overwrites, so guard with an exists probe for the test
    // environment (the race window is the object-store caveat above)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"manifest version $version already committed at $sink")
    }
  }

  /** Maintenance compaction: rewrite the committed snapshot into
    * `numFiles` coalesced data files and publish THAT list as the next
    * manifest version. Incremental appends accrete one small batch dir
    * per run; at 100 TB the reader's cost is O(files), so periodic
    * compaction is what keeps the manifest (and the footer-stats
    * watermark sweep) from growing without bound.
    *
    * Row-preserving by construction (`readCommitted` before == after —
    * spec-pinned) and snapshot-isolated like any commit: pre-compaction
    * data files are never touched, so a reader pinned to an older
    * manifest version is unaffected; only [[vacuumUncommitted]]
    * (whose liveness root is the LATEST manifest) reclaims them, which
    * is exactly Delta's VACUUM retention trade. Contends with
    * appenders on the same optimistic-concurrency token: if anything
    * commits between the snapshot read and the publish, the compaction
    * loses, cleans its staged files, and throws — re-run.
    *
    * Returns (files before, files after).
    */
  def compact(spark: SparkSession, sink: String,
      numFiles: Int = 1): (Int, Int) =
    compactWithHook(spark, sink, numFiles, () => ())

  private[graft] def compactWithHook(spark: SparkSession, sink: String,
      numFiles: Int, beforePublish: () => Unit): (Int, Int) = {
    val (version, prior) = snapshot(spark, sink)
    require(prior.nonEmpty, s"nothing committed to compact at $sink")
    val staged = replaceWithHook(
      readCommitted(spark, sink).repartition(numFiles),
      sink, version, beforePublish)
    (prior.size, staged.size)
  }

  /** Replace the committed snapshot with `df`'s contents as manifest
    * version `expectVersion + 1` — the OCC primitive behind [[compact]]
    * and `IncrementalAgg`'s state fold. Prior data files stay on disk
    * for pinned readers until [[vacuumUncommitted]]; any commit that
    * lands after the caller's snapshot read collides at publish and
    * this replacement loses (staged files cleaned, exception thrown —
    * re-run from a fresh snapshot).
    */
  def replaceSnapshot(df: DataFrame, sink: String,
      expectVersion: Long): Unit =
    { replaceWithHook(df, sink, expectVersion, () => ()); () }

  private[graft] def replaceWithHook(df: DataFrame, sink: String,
      expectVersion: Long, beforePublish: () => Unit): Seq[String] = {
    val spark = df.sparkSession
    val fs = fsOf(spark, sink)
    val staged = stageBatch(df, spark, fs, sink)
    try {
      beforePublish()
      publish(fs, sink, staged, expectVersion + 1)
    } catch { case e: Throwable =>
      staged.headOption.foreach(f =>
        fs.delete(new Path(s"$sink/$f").getParent, true))
      throw e
    }
    staged
  }

  /** GC staged-but-uncommitted batch directories (crashed or lost-race
    * writers). ONLY safe when no writer is actively staging — the
    * caller owns that scheduling, exactly like Delta's VACUUM.
    */
  def vacuumUncommitted(spark: SparkSession, sink: String): Int = {
    val fs = fsOf(spark, sink)
    val dataRoot = new Path(sink, DataDir)
    if (!fs.exists(dataRoot)) return 0
    val live = committedFiles(spark, sink)
      .map(f => f.split("/")(1)).toSet // batch dir component
    val orphans = fs.listStatus(dataRoot).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("batch-") && !live.contains(p.getName))
    orphans.foreach(fs.delete(_, true))
    orphans.size
  }
}
