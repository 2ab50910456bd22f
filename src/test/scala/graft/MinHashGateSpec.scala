package graft

import graft.streaming.MinHashGate
import org.apache.spark.sql.functions._

/** The streaming near-dup gate must equal the batch incremental probe
  * on the same corpus/batch split, ignore micro-batch boundaries, and
  * never drop on a band collision alone (the Jaccard verify).
  */
class MinHashGateSpec extends SparkSpec {

  test("gate ≡ the batch incremental cut on the harness split") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val gate = MinHashGate.fromCorpus(corpus)
    val kept = gate.scrubDocs(batch).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val droppedByBatchQuery = SparkEntry.registry("q_dedup_incremental")
      .fn(spark, sfDir).select("new_id")
      .collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == batchIds -- droppedByBatchQuery)
    InternalCaches.drain(blocking = true)
  }

  test("micro-batch boundaries are invisible; engineered dups drop") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val variant = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
    val other = (1 to 30).map(i => s"alt$i").mkString(" ")
    val corpus = Seq(3L -> base, 4L -> other).toDF("doc_id", "text")
    val gate = MinHashGate.fromCorpus(corpus)
    val batch = Seq(9L -> variant, 7L -> other.replace("alt3", "altX"),
      5L -> (1 to 30).map(i => s"new$i").mkString(" "))
      .toDF("doc_id", "text")
    val whole = gate.scrubDocs(batch).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // 9 near-dups the corpus base; 7 near-dups 'other'; 5 is novel
    assert(whole == Set(5L))
    // the same rows arriving as three one-row batches decide identically
    val split = batch.collect().flatMap { r =>
      gate.scrubDocs(Seq((r.getLong(0), r.getString(1))).toDF("doc_id", "text"))
        .select("doc_id").collect().map(_.getLong(0))
    }.toSet
    assert(split == whole)
    InternalCaches.drain(blocking = true)
  }
}
