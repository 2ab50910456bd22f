package graft.streaming

import graft.operators.TextAnalysis
import graft.pipelines.Corpus
import graft.streaming.BatchDirs.{batchPartitions, deleteOlderThan}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming corpus ETL: documents arrive as a stream and leave as
  * training-ready chunk rows — quality gate → EXACT dedup (batch-
  * internal min-id, then against every previously-admitted document's
  * fingerprint) → optional benchmark decontamination ([[DocGate]]:
  * [[BenchmarkGate]] exact copies via a bloom-prefiltered anti-join
  * on the same fingerprint, or [[WinnowGate]] edit-drifted copies
  * via shared winnow fingerprints) → optional NEAR-DUP admission
  * (`nearDupJaccard`: the `CorpusStream` band/shingle admission core
  * over a sibling index under `<indexDir>/neardup`, run after every
  * cheaper gate) → sliding-window chunking — with the same
  * replay-safety mechanics as `CorpusStream` (the near-dup sibling):
  *
  *  - every write goes to `<dir>/batch=<id>` with Overwrite, so a
  *    replayed micro-batch rewrites its own partition instead of
  *    double-appending chunks or fingerprints;
  *  - the fingerprint probe anti-joins out the current batch's own
  *    doc_ids, so a crashed attempt's leftovers cannot drop the very
  *    docs that wrote them (doc_id must be unique stream-wide — the
  *    `CorpusStream` contract);
  *  - every `compactEvery` batches the fingerprint partitions fold
  *    (distinct()ed) into the current one and the old directories are
  *    deleted — index files stay O(compactEvery); a crash between fold
  *    and delete re-collapses on replay;
  *  - operator-internal caches are scoped to the batch.
  *
  * State is one (doc_id, fp) row per ADMITTED document — bounded by
  * the corpus, keyed nowhere (the probe is a fp equi-join, and at
  * 100 TB the index would bucket by fp); chunks never re-enter the
  * pipeline.
  */
object CorpusEtlStream {

  /** One micro-batch step — public so the spec (and a backfill job)
    * can drive it with deterministic batch boundaries. Idempotent in
    * `batchId`.
    */
  def prepareBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      sinkDir: String, cfg: Corpus.Config = Corpus.Config(),
      chunkTokens: Int = 128, stride: Int = 96,
      compactEvery: Int = 8,
      benchmark: Option[DocGate] = None,
      nearDupJaccard: Option[Double] = None): Unit =
    graft.InternalCaches.scoped {
      val spark = batch.sparkSession
      if (!batch.isEmpty) {
        prepareBatchBody(batch, batchId, indexDir, sinkDir, cfg,
          chunkTokens, stride, compactEvery, benchmark, nearDupJaccard, spark)
      }
    }

  private def prepareBatchBody(batch: DataFrame, batchId: Long,
      indexDir: String, sinkDir: String, cfg: Corpus.Config,
      chunkTokens: Int, stride: Int, compactEvery: Int,
      benchmark: Option[DocGate], nearDupJaccard: Option[Double],
      spark: SparkSession): Unit = {
    val fpPath = s"$indexDir/fps"
    val batchDocIds = batch.select("doc_id")
    // ONE filesystem listing per batch decides both the probe and the
    // compaction branch (each listing is a remote LIST on an
    // object-store index)
    val havePrior = batchPartitions(spark, fpPath).nonEmpty
    // quality gate, then batch-internal exact dedup — the fingerprint
    // is computed ONCE and drives the min-id keep directly (running
    // Corpus.exactDedup here would md5-normalize every doc a second
    // time for the same key)
    val gated = Corpus.qualityFilter(batch, cfg)
      .withColumn("__fp", TextAnalysis.fingerprint(col("text")))
    val keepIds = gated.groupBy(col("__fp"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = gated.join(keepIds, Seq("doc_id"), "left_semi")
    // benchmark decontamination: the exact gate rides the SAME
    // fingerprint column the dedup already computed (zero extra text
    // passes); a winnow gate scores the text instead
    val clean = benchmark.fold(deduped)(_.scrubWithFp(deduped, "__fp"))
    // drop docs whose fingerprint is already ADMITTED — excluding this
    // batch's own ids (the replay shield)
    val survivors =
      if (havePrior) {
        val priorFps = spark.read.parquet(fpPath)
          .select(col("doc_id").as("idx_id"), col("fp").as("__fp"))
          .join(batchDocIds.select(col("doc_id").as("idx_id")),
            Seq("idx_id"), "left_anti")
          .select("__fp").distinct()
        clean.join(priorFps, Seq("__fp"), "left_anti")
      } else clean
    // optional near-dup stage: the CorpusStream admission core over a
    // sibling band/shingle index — probe the admitted corpus, exact-
    // verify, batch-internal near-dedup, land the survivors' bands.
    // Runs AFTER exact dedup + decontam + the prior-fp drop, so the
    // near-dup index only ever holds docs every cheaper gate admitted.
    // admitNearDups localCheckpoints its result; the no-near-dup path
    // checkpoints here — either way the frame below is materialized.
    val (admitted, ckpt) = nearDupJaccard match {
      case Some(j) =>
        (CorpusStream.admitNearDups(survivors.select("doc_id", "text", "__fp"),
          batchDocIds, batchId, s"$indexDir/neardup", j, compactEvery),
          Seq.empty: graft.InternalCaches.Handle)
      case None =>
        graft.InternalCaches.localCheckpointHandle(
          survivors.select("doc_id", "text", "__fp"))
    }
    graft.InternalCaches.trackRdds(ckpt)
    TextAnalysis.chunkDocs(admitted, "doc_id", "text", chunkTokens, stride)
      .write.mode(SaveMode.Overwrite).parquet(s"$sinkDir/batch=$batchId")
    val newFps = admitted.select(col("doc_id"), col("__fp").as("fp"))
    val compact = compactEvery > 0 && batchId % compactEvery == 0 && havePrior
    if (compact) {
      val priorFps = spark.read.parquet(fpPath).select("doc_id", "fp")
        .join(batchDocIds, Seq("doc_id"), "left_anti")
      val (fold, foldCkpt) = graft.InternalCaches.localCheckpointHandle(
        priorFps.union(newFps).distinct().coalesce(2))
      graft.InternalCaches.trackRdds(foldCkpt)
      fold.write.mode(SaveMode.Overwrite).parquet(s"$fpPath/batch=$batchId")
      deleteOlderThan(spark, fpPath, batchId)
    } else {
      newFps.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$fpPath/batch=$batchId")
    }
  }

  /** Wire the step into a checkpointed AvailableNow/continuous stream. */
  def prepareStream(docs: DataFrame, indexDir: String, sinkDir: String,
      checkpointDir: String, cfg: Corpus.Config = Corpus.Config(),
      chunkTokens: Int = 128, stride: Int = 96, compactEvery: Int = 8,
      benchmark: Option[DocGate] = None,
      nearDupJaccard: Option[Double] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        prepareBatchStep(batch, batchId, indexDir, sinkDir, cfg,
          chunkTokens, stride, compactEvery, benchmark, nearDupJaccard)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
