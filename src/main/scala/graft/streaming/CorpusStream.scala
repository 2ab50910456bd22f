package graft.streaming

import graft.operators.Dedup
import graft.pipelines.Corpus
import org.apache.spark.sql.{DataFrame, SaveMode}
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
  *   4. admitted docs append to the sink, their bands/shingles to the
  *      index.
  *
  * State is the index directory: bounded by the ADMITTED corpus (not
  * the stream length), keyed by band bucket so the per-batch probe
  * shuffles only the batch. The streaming checkpoint makes file
  * ingestion exactly-once per batch; a mid-step crash can replay step
  * 4's appends, so a transactional table format (or a doc_id dedup on
  * read) is the production sink — the same caveat every
  * foreachBatch-append pipeline carries.
  */
object CorpusStream {

  private def exists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** One micro-batch step — factored out so the spec (and a backfill
    * job) can drive it directly with deterministic batch boundaries.
    */
  def nearDedupBatchStep(batch: DataFrame, indexDir: String, sinkDir: String,
      minJaccard: Double): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val bandsPath = s"$indexDir/bands"
    val shinglesPath = s"$indexDir/shingles"
    val sh = Dedup.shingled(batch, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = Dedup.lshBandsFromShingles(sh, "doc_id")
    // docs near-dupped by the ADMITTED corpus: band-bucket probe, then
    // exact Jaccard against the admitted shingle sets (candidate-only
    // work, the batch LSH contract)
    val doomedByIndex =
      if (exists(spark, bandsPath)) {
        val idxBands = spark.read.parquet(bandsPath)
          .select(col("doc_id").as("idx_id"), col("band"), col("band_key"))
        val idxSh = spark.read.parquet(shinglesPath)
          .select(col("doc_id").as("idx_id"), col("sh").as("sh_old"))
        bands.join(idxBands, Seq("band", "band_key"))
          .select(col("doc_id"), col("idx_id")).distinct()
          .join(sh.select(col("doc_id"), col("sh").as("sh_new")), "doc_id")
          .join(idxSh, "idx_id")
          .filter(Dedup.jaccard(col("sh_new"), col("sh_old")) >= minJaccard)
          .select("doc_id").distinct()
      } else spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    val survivors = batch.join(doomedByIndex, Seq("doc_id"), "left_anti")
    // batch-internal near-dedup (min-id canonical within the batch)
    val admitted = Corpus.nearDedup(survivors, "doc_id", "text", minJaccard)
      .select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val admittedIds = admitted.select("doc_id")
    admitted.write.mode(SaveMode.Append).parquet(sinkDir)
    bands.join(admittedIds, "doc_id")
      .write.mode(SaveMode.Append).parquet(bandsPath)
    sh.join(admittedIds, "doc_id")
      .write.mode(SaveMode.Append).parquet(shinglesPath)
    admitted.unpersist()
    sh.unpersist()
  }

  /** Wire the step into a checkpointed AvailableNow/continuous stream. */
  def nearDedupStream(docs: DataFrame, indexDir: String, sinkDir: String,
      checkpointDir: String, minJaccard: Double = 0.8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        nearDedupBatchStep(batch, indexDir, sinkDir, minJaccard)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
