package graft.streaming

import graft.operators.Dedup
import graft.pipelines.Corpus
import graft.streaming.BatchDirs.{batchPartitions, deleteOlderThan}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming near-duplicate dedup: documents arrive as a stream and
  * are admitted only if no already-admitted document is a near-dup —
  * the incremental form of the batch MinHash-LSH pipeline
  * (`Corpus.nearDedup`), with FIRST-ARRIVAL-WINS canonicals instead of
  * the batch min-id rule.
  *
  * Why not a single keyed-state operator: a document's admit decision
  * spans its 32 LSH band buckets, which land in 32 different state
  * groups — `flatMapGroupsWithState` can vote per bucket but cannot
  * decide per document without a second stateful stage, and an
  * optimistic per-bucket registration would let REJECTED docs squat on
  * buckets (over-dropping later arrivals). The scale-honest shape is
  * the one production incremental dedup pipelines use: `foreachBatch`
  * against a persistent, bucket-keyed admitted-bands index plus a
  * shingle side table for exact verification.
  *
  * Per micro-batch (all key-equi joins — no cross products):
  *   1. shingle + band the batch (the exact batch code paths);
  *   2. candidates = batch bands ⋈ index bands on (band, band_key),
  *      exact-verified by Jaccard against the admitted shingles;
  *   3. survivors get the batch-internal near-dedup
  *      (`Corpus.nearDedup`: LSH pairs → components → keep min id);
  *   4. admitted docs land in the sink, their bands/shingles in the
  *      index — each in a `batch=<id>` partition directory.
  *
  * REPLAY SAFETY (exactly-once effective semantics without a
  * transactional table format):
  *   - every write goes to `<dir>/batch=<batchId>` with Overwrite, so
  *     a replayed micro-batch rewrites its own partition instead of
  *     double-appending sink or index;
  *   - the index probe excludes the current batch's doc_ids by
  *     anti-join (NOT by partition), so leftovers from a crashed
  *     attempt of this very batch can't self-match and over-drop, and
  *     the admit decision is bit-identical on every attempt;
  *   - `admitted` is localCheckpoint'ed before any write, truncating
  *     lineage over the index files the overwrite is about to replace.
  *     localCheckpoint is executor-local, NOT fault-tolerant: an
  *     executor lost between checkpoint and the writes fails that
  *     attempt — acceptable only because the idempotent replay re-runs
  *     the batch cleanly (a lossy cluster wanting attempt-level
  *     recovery would use reliable checkpoint() to DFS instead);
  *   - the anti-join shield keys on doc_id, so doc_id MUST be unique
  *     across the stream's lifetime (the usual contract for a document
  *     corpus). A source that re-delivers an already-admitted doc_id in
  *     a LATER batch is indistinguishable from a crashed attempt of
  *     that batch: the old index rows are excluded from the probe and
  *     the doc is re-admitted as a duplicate sink row.
  *
  * COMPACTION: every `compactEvery` batches the prior index partitions
  * are folded (together with the batch's own rows) into the current
  * `batch=<id>` partition and the old directories deleted, bounding
  * index file count by O(compactEvery), not O(stream length). A crash
  * between fold and delete leaves prior rows present in both an old
  * partition and the fold; admission stays correct (the probe ends in
  * `distinct()`), and the replayed fold `distinct()`s its input so the
  * duplicates collapse instead of accumulating. A crash after the
  * deletes is covered by the fold: reads go through the parent
  * directory, so rows survive in whichever partition carries them.
  *
  * State is the index directory: bounded by the ADMITTED corpus (not
  * the stream length), keyed by band bucket so the per-batch probe
  * shuffles only the batch.
  */
object CorpusStream {

  /** One micro-batch step — factored out so the spec (and a backfill
    * job) can drive it directly with deterministic batch boundaries.
    * Idempotent in `batchId`: re-running the same (batch, batchId) is a
    * no-op on the final sink/index state.
    */
  def nearDedupBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      sinkDir: String, minJaccard: Double, compactEvery: Int = 8,
      benchmark: Option[DocGate] = None): Unit =
    // every operator-internal cache this batch creates (the admitted/
    // fold checkpoints, the shingle persists and component checkpoints
    // inside Corpus.nearDedup) is scoped to the batch and released on
    // exit — a stream that skipped this would leak one cache set per
    // micro-batch, and a GLOBAL drain here would invalidate caches of
    // other queries sharing the session
    graft.InternalCaches.scoped {
      nearDedupBatchBody(batch, batchId, indexDir, sinkDir, minJaccard,
        compactEvery, benchmark)
    }

  private def nearDedupBatchBody(batch: DataFrame, batchId: Long,
      indexDir: String, sinkDir: String, minJaccard: Double,
      compactEvery: Int, benchmark: Option[DocGate]): Unit = {
    if (batch.isEmpty) return
    // benchmark decontamination first: a contaminated doc must neither
    // reach the sink nor enter the index (where it would near-dup-kill
    // LEGITIMATE docs resembling it). Replay-safe: the gate is a pure
    // filter, so a replayed batch drops the same docs again.
    val gated = benchmark.fold(batch)(_.scrubDocs(batch))
    val admitted = admitNearDups(gated, batch.select("doc_id"), batchId,
      indexDir, minJaccard, compactEvery)
    admitted.select("doc_id", "text")
      .write.mode(SaveMode.Overwrite).parquet(s"$sinkDir/batch=$batchId")
  }

  /** The near-dup ADMISSION core, shared with `CorpusEtlStream`'s
    * optional near-dup stage: probe the admitted-bands index, exact-
    * verify candidates by Jaccard, batch-internal near-dedup, then
    * land the admitted docs' bands/shingles in the index partition for
    * `batchId` (with the compaction fold). Returns the admitted docs
    * in the INPUT's full schema, localCheckpoint'ed (lineage truncated
    * over the index files a replay overwrites) and cache-tracked.
    * `batchDocIds` is the PRE-GATE batch id set — the replay shield
    * must exclude every id a crashed attempt could have written.
    */
  private[streaming] def admitNearDups(gated: DataFrame,
      batchDocIds: DataFrame, batchId: Long, indexDir: String,
      minJaccard: Double, compactEvery: Int): DataFrame = {
    val spark = gated.sparkSession
    val bandsPath = s"$indexDir/bands"
    val shinglesPath = s"$indexDir/shingles"
    val sh = Dedup.shingled(gated, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = Dedup.lshBandsFromShingles(sh, "doc_id")
    val havePrior = batchPartitions(spark, bandsPath).nonEmpty
    // docs near-dupped by the ADMITTED corpus: band-bucket probe, then
    // exact Jaccard against the admitted shingle sets (candidate-only
    // work, the batch LSH contract). The anti-join against the batch's
    // own ids is the replay shield — see the object doc.
    val doomedByIndex =
      if (havePrior) {
        val idxBands = spark.read.parquet(bandsPath)
          .select(col("doc_id").as("idx_id"), col("band"), col("band_key"))
          .join(batchDocIds.select(col("doc_id").as("idx_id")), Seq("idx_id"), "left_anti")
        val idxSh = spark.read.parquet(shinglesPath)
          .select(col("doc_id").as("idx_id"), col("sh").as("sh_old"))
          .join(batchDocIds.select(col("doc_id").as("idx_id")), Seq("idx_id"), "left_anti")
        bands.join(idxBands, Seq("band", "band_key"))
          .select(col("doc_id"), col("idx_id")).distinct()
          .join(sh.select(col("doc_id"), col("sh").as("sh_new")), "doc_id")
          .join(idxSh, "idx_id")
          // quantize before comparing — the same 1e-4-grid boundary
          // rule as MinHashGate and the batch paths (Dedup,
          // DedupIncremental), so gate/batch/stream cuts agree on
          // pairs whose raw Jaccard floats a ULP around the threshold
          .filter(round(Dedup.jaccard(col("sh_new"), col("sh_old")), 4)
            >= minJaccard)
          .select("doc_id").distinct()
      } else spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    val survivors = gated.join(doomedByIndex, Seq("doc_id"), "left_anti")
    // batch-internal near-dedup (min-id canonical within the batch);
    // localCheckpoint truncates lineage over the index files the
    // writes below may replace on a replay
    val (admitted, admittedCkpt) = graft.InternalCaches.localCheckpointHandle(
      Corpus.nearDedup(survivors, "doc_id", "text", minJaccard))
    graft.InternalCaches.trackRdds(admittedCkpt)
    val admittedIds = admitted.select("doc_id")
    // micro-batches are small → one file per partition dir; at 100 TB
    // size this by bytes (batchRows / targetFileRows) instead
    val newBands = bands.join(admittedIds, "doc_id")
      .select("doc_id", "band", "band_key")
    val newSh = sh.join(admittedIds, "doc_id").select("doc_id", "sh")
    val compact = compactEvery > 0 && havePrior && batchId % compactEvery == 0
    if (compact) {
      val priorBands = spark.read.parquet(bandsPath)
        .select("doc_id", "band", "band_key")
        .join(batchDocIds, Seq("doc_id"), "left_anti")
      val priorSh = spark.read.parquet(shinglesPath)
        .select("doc_id", "sh")
        .join(batchDocIds, Seq("doc_id"), "left_anti")
      // materialize the fold BEFORE overwriting inside the same tree:
      // the write job must not re-list files its own Overwrite deletes.
      // distinct() folds away rows a prior crash (between fold-write and
      // partition delete) left present in BOTH an old partition and the
      // fold — without it those rows re-duplicate on every replay and
      // persist in the index permanently
      val (foldBands, fbCkpt) = graft.InternalCaches.localCheckpointHandle(
        priorBands.union(newBands).distinct().coalesce(2))
      val (foldSh, fsCkpt) = graft.InternalCaches.localCheckpointHandle(
        priorSh.union(newSh).distinct().coalesce(2))
      graft.InternalCaches.trackRdds(fbCkpt)
      graft.InternalCaches.trackRdds(fsCkpt)
      foldBands.write.mode(SaveMode.Overwrite).parquet(s"$bandsPath/batch=$batchId")
      foldSh.write.mode(SaveMode.Overwrite).parquet(s"$shinglesPath/batch=$batchId")
      for (dir <- Seq(bandsPath, shinglesPath))
        deleteOlderThan(spark, dir, batchId)
    } else {
      newBands.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$bandsPath/batch=$batchId")
      newSh.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$shinglesPath/batch=$batchId")
    }
    sh.unpersist()
    admitted
  }

  /** Wire the step into a checkpointed AvailableNow/continuous stream. */
  def nearDedupStream(docs: DataFrame, indexDir: String, sinkDir: String,
      checkpointDir: String, minJaccard: Double = 0.8,
      compactEvery: Int = 8,
      benchmark: Option[DocGate] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDedupBatchStep(batch, batchId, indexDir, sinkDir, minJaccard,
          compactEvery, benchmark)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
