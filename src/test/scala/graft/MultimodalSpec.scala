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
}
