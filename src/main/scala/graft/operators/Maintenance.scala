package graft.operators

import org.apache.spark.sql.SparkSession

/** The steady-state maintenance loop of a manifest-committed table —
  * the operational composition of the pieces that exist separately
  * (OPTIMIZE, Bloom re-cover, file-level and whole-dir vacuum), in the
  * order a scheduler would run them after a stretch of CDC merges:
  *
  *  1. OPTIMIZE: clustered rewrite when `clusterCols` is given
  *     (restores the key intervals churn destroyed, so the NEXT
  *     merge prunes again), plain coalescing compaction otherwise
  *     (bounds the manifest and the footer-sweep cost).
  *  2. Bloom re-cover: the rewrite produced sidecar-less files —
  *     correct (absent = may-contain) but un-pruned; one distributed
  *     [[BloomSkip.ensureSidecars]] job per lookup column restores
  *     point-lookup skipping.
  *  3. Vacuum: [[AtomicIncrement.vacuumSuperseded]] reclaims files a
  *     partial-rewrite merge replaced inside still-live batch dirs;
  *     [[AtomicIncrement.vacuumUncommitted]] reclaims whole dirs the
  *     latest manifest no longer references (pre-compaction batches,
  *     crashed stages). Together they bound the sink's on-disk file
  *     count at the committed snapshot.
  *
  * Scheduling contract (the caller's, exactly like Delta VACUUM): run
  * with no writer actively staging, and accept that time travel to
  * pre-maintenance versions ends when the vacuums reclaim their files.
  * Pinned readers of the LATEST manifest are never affected — every
  * step is its own snapshot-isolated commit.
  *
  * Reference anchor: the reference's star tables are rebuilt whole
  * every run (datasets/create_*.ipynb); at 100 TB the same tables live
  * as merged snapshots, and this loop is what keeps their read cost
  * (files, intervals, sidecars) from degrading as CDC churn accretes.
  */
object Maintenance {

  /** What one pass did — the numbers a maintenance log would record.
    * `rewrote = false` means the fragmentation trigger skipped the
    * table rewrite (the pass was metadata/increment-sized).
    */
  final case class Report(filesBefore: Int, filesAfter: Int,
      rewrote: Boolean, sidecarsBuilt: Int, supersededRemoved: Int,
      orphanDirsRemoved: Int)

  /** One maintenance target: an atomic sink plus its layout policy.
    * `triggerFiles` is the fragmentation trigger: the OPTIMIZE rewrite
    * runs only when the committed file count EXCEEDS
    * `max(targetFiles, triggerFiles)` — without it a scheduled pass
    * would rewrite the WHOLE table every run, i.e. a daily pipeline
    * would pay 100 TB of writes daily for zero layout change. A
    * skipped rewrite still re-covers sidecars (increment-sized) and
    * vacuums (metadata-sized), so the pass stays cheap when the table
    * is healthy and table-sized only when fragmentation warrants it.
    */
  final case class Target(sink: String, clusterCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, targetFiles: Int = 8,
      triggerFiles: Int = 0)

  /** One full pass over one sink. OCC applies to the compaction like
    * any snapshot replace: if a live writer commits concurrently the
    * compaction loses and throws — re-run at a quieter moment (the
    * vacuums never ran, so nothing was reclaimed under the winner).
    */
  def maintainAtomic(spark: SparkSession, target: Target): Report = {
    val committed = AtomicIncrement.committedFiles(spark, target.sink).size
    val rewrite = committed > math.max(target.targetFiles,
      target.triggerFiles)
    val (before, after) =
      if (!rewrite) (committed, committed)
      else if (target.clusterCols.nonEmpty)
        AtomicIncrement.compactClustered(spark, target.sink,
          target.clusterCols, target.targetFiles)
      else
        AtomicIncrement.compact(spark, target.sink, target.targetFiles)
    val built = target.bloomCols.map(c =>
      BloomSkip.ensureSidecars(spark, target.sink, c)).sum
    val superseded = AtomicIncrement.vacuumSuperseded(spark, target.sink)
    val orphans = AtomicIncrement.vacuumUncommitted(spark, target.sink)
    Report(before, after, rewrite, built, superseded, orphans)
  }
}
