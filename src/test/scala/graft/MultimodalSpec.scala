package graft

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the mapPartitions batch decoder agrees with
  * the columnar stub, and frame sampling explodes the right offsets.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeBatch (mapPartitions) matches the columnar stub decoder") {
    val d = Tables.table(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary"))
    val batch = Multimodal.decodeBatch(d, "doc_id", "payload")
      .collect().map(m => (m.doc_id, m.n_bytes, m.width, m.height, m.n_frames)).toSet
    val columnar = SparkEntry.queries("q_multimodal_meta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(batch == columnar)
  }

  test("sampleFrames keeps every step-th index below n_frames") {
    val got = spark.range(1)
      .select(Multimodal.sampleFrames(lit(10), step = 3, frameBytes = 1024L).as("f"))
      .head().getSeq[Long](0)
    assert(got == Seq(0L, 3L, 6L, 9L))
  }

  test("resizeBatch shrinks payloads toward the target and is deterministic") {
    val d = Tables.table(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary")).limit(50)
    val out = Multimodal.resizeBatch(d, "doc_id", "payload", 64, 64).collect()
    assert(out.length == 50)
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(r => r.payload.nonEmpty && r.payload.length <= 64 * 64 / 64 + 1))
    val again = Multimodal.resizeBatch(d, "doc_id", "payload", 64, 64).collect()
    assert(out.map(r => (r.doc_id, r.payload.toSeq)).toSet ==
      again.map(r => (r.doc_id, r.payload.toSeq)).toSet)
  }

  test("embedBatch emits a real embedding column the ANN operators accept") {
    val d = Tables.table(spark, sfDir, "documents")
      .withColumn("payload", col("text").cast("binary")).limit(40)
    val emb = Multimodal.embedBatch(d, "doc_id", "payload").toDF()
      .withColumnRenamed("doc_id", "vec_id")
    val rows = emb.collect()
    assert(rows.forall(_.getSeq[Float](1).length == 64))
    // content-sensitive: more than one distinct vector
    assert(rows.map(_.getSeq[Float](1)).distinct.length > 1)
    // end-to-end: stubbed encoder output drives the real brute-force ANN
    val queries = emb.limit(3)
    val topk = graft.operators.Similarity.bruteForceTopK(emb, queries, k = 5)
    val counts = topk.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 3 && counts.forall(_ == 5))
  }
}
