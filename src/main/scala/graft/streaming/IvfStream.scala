package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Streaming vector ingest into the incremental IVF index — the
  * wired twin of `q_ann_ivf_incremental`: each micro-batch of
  * `(vec_id, embedding)` rows is ONE [[Similarity.appendIvfIncrement]]
  * keyed on the foreachBatch batch id (a map-only assign pass against
  * the frozen quantizer, cost ∝ batch), so a 100 TB ANN index absorbs
  * an embedding stream without ever rebuilding. Probes
  * ([[Similarity.probeIvfIncremental]]) run concurrently against
  * whatever has landed — they read the committed generation, lock-free.
  *
  * Exactly-once across replays is structural, twice over: the
  * `batch=<id>` directory overwrites WHOLE on redelivery (a crashed
  * batch's partial files are replaced byte-identically), and the
  * generation's `_FOLDED` horizon no-ops any id an intervening
  * compaction already folded — the one replay shape a plain overwrite
  * shield cannot survive, because the folded generation no longer has
  * the batch directory to overwrite.
  *
  * `compactEvery > 0` folds tombstone-free single-batch generations on
  * a cadence, bounding the directory count a probe must list (the
  * small-files problem of any append-only index); the fold itself is
  * the crash-safe `LATEST`-flip publication, so a kill mid-compaction
  * replays cleanly. The fold leg is horizon-guarded
  * ([[Similarity.incFoldedThrough]]): a redelivery of a compacting
  * batch AFTER its compaction landed no-ops entirely — without the
  * guard the append would no-op but the fold would re-run, paying a
  * corpus-sized rewrite and minting a garbage generation per
  * redelivery. Single maintenance writer (the streaming query), like
  * every snapshot-pointer sink here.
  */
object IvfStream {

  def ingestBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      cents: Seq[(Long, Seq[Double])], compactEvery: Long = 0L): Unit = {
    val spark = batch.sparkSession
    Similarity.appendIvfIncrement(spark, indexDir, batch, cents, batchId)
    if (compactEvery > 0L && batchId % compactEvery == compactEvery - 1L &&
        batchId > Similarity.incFoldedThrough(spark, indexDir))
      Similarity.compactIvfIncremental(spark, indexDir)
  }

  /** CDC variant: each micro-batch carries `(vec_id, embedding, op)`
    * rows — `op` = "delete" takes the document down, anything else
    * re-embeds it ([[Similarity.upsertIvfIncrement]]: tombstone every
    * incoming id, re-append the non-deletes in the same batch). This
    * is the encoder-refresh / document-edit stream a production ANN
    * index actually receives; per batch the cost is ∝ churn.
    */
  def upsertBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      cents: Seq[(Long, Seq[Double])], compactEvery: Long = 0L,
      opCol: String = "op"): Unit = {
    val spark = batch.sparkSession
    Similarity.upsertIvfIncrement(spark, indexDir, batch, cents, batchId,
      opCol)
    if (compactEvery > 0L && batchId % compactEvery == compactEvery - 1L &&
        batchId > Similarity.incFoldedThrough(spark, indexDir))
      Similarity.compactIvfIncremental(spark, indexDir)
  }

  def upsertStream(changes: DataFrame, indexDir: String,
      cents: Seq[(Long, Seq[Double])], checkpointDir: String,
      compactEvery: Long = 0L, opCol: String = "op",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .foreachBatch { (b: DataFrame, id: Long) =>
        upsertBatchStep(b, id, indexDir, cents, compactEvery, opCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  def ingestStream(vecs: DataFrame, indexDir: String,
      cents: Seq[(Long, Seq[Double])], checkpointDir: String,
      compactEvery: Long = 0L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .foreachBatch { (b: DataFrame, id: Long) =>
        ingestBatchStep(b, id, indexDir, cents, compactEvery)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Ingest with a semantic-decontamination admission gate
    * ([[graft.operators.Hygiene.semanticGate]]): rows within `tau`
    * cosine of any frozen eval-panel vector are dropped BEFORE the
    * assign pass, so a contaminated vector never reaches the index —
    * cheaper and safer than indexing it and masking later, because a
    * tombstone can be forgotten but an un-indexed row cannot leak
    * into a probe. The gate is a pure per-batch filter (broadcast
    * panel, map-side threshold), so every replay shield of the
    * underlying append applies unchanged.
    */
  def gatedIngestBatchStep(batch: DataFrame, batchId: Long,
      indexDir: String, cents: Seq[(Long, Seq[Double])],
      evalVecs: DataFrame, tau: Double,
      compactEvery: Long = 0L): Unit =
    ingestBatchStep(
      graft.operators.Hygiene.semanticGate(batch, evalVecs, tau),
      batchId, indexDir, cents, compactEvery)

  def gatedIngestStream(vecs: DataFrame, indexDir: String,
      cents: Seq[(Long, Seq[Double])], evalVecs: DataFrame, tau: Double,
      checkpointDir: String, compactEvery: Long = 0L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .foreachBatch { (b: DataFrame, id: Long) =>
        gatedIngestBatchStep(b, id, indexDir, cents, evalVecs, tau,
          compactEvery)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The compressed-index twin: each micro-batch is ONE
    * [[Similarity.appendPqIncrement]] — a map-only ENCODE pass against
    * the frozen codebook, so what streams into long-term storage is M
    * bytes per vector, not the full embedding. Same replay shields
    * (whole-batch overwrite + `_FOLDED` horizon), same fold cadence.
    */
  def pqIngestBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      cents: Seq[(Long, Seq[Double])], compactEvery: Long = 0L,
      numSubspaces: Int = 8, dim: Int = 64): Unit = {
    val spark = batch.sparkSession
    Similarity.appendPqIncrement(spark, indexDir, batch, cents, batchId,
      numSubspaces, dim)
    if (compactEvery > 0L && batchId % compactEvery == compactEvery - 1L &&
        batchId > Similarity.incFoldedThrough(spark, indexDir))
      Similarity.compactPqIncremental(spark, indexDir)
  }

  def pqIngestStream(vecs: DataFrame, indexDir: String,
      cents: Seq[(Long, Seq[Double])], checkpointDir: String,
      compactEvery: Long = 0L, numSubspaces: Int = 8, dim: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .foreachBatch { (b: DataFrame, id: Long) =>
        pqIngestBatchStep(b, id, indexDir, cents, compactEvery,
          numSubspaces, dim)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** CDC on the compressed index — [[upsertBatchStep]]'s contract
    * through [[Similarity.upsertPqIncrement]], so re-embedded
    * documents re-ENCODE against the frozen codebook in the same
    * batch that tombstones their old codes. Completes the
    * {full-vector, compressed} × {ingest, upsert} × {batch, stream}
    * matrix.
    */
  def pqUpsertBatchStep(batch: DataFrame, batchId: Long, indexDir: String,
      cents: Seq[(Long, Seq[Double])], compactEvery: Long = 0L,
      numSubspaces: Int = 8, dim: Int = 64, opCol: String = "op"): Unit = {
    val spark = batch.sparkSession
    Similarity.upsertPqIncrement(spark, indexDir, batch, cents, batchId,
      numSubspaces, dim, opCol)
    if (compactEvery > 0L && batchId % compactEvery == compactEvery - 1L &&
        batchId > Similarity.incFoldedThrough(spark, indexDir))
      Similarity.compactPqIncremental(spark, indexDir)
  }

  def pqUpsertStream(changes: DataFrame, indexDir: String,
      cents: Seq[(Long, Seq[Double])], checkpointDir: String,
      compactEvery: Long = 0L, numSubspaces: Int = 8, dim: Int = 64,
      opCol: String = "op",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .foreachBatch { (b: DataFrame, id: Long) =>
        pqUpsertBatchStep(b, id, indexDir, cents, compactEvery,
          numSubspaces, dim, opCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
