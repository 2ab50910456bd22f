package graft

import graft.operators.TextAnalysis
import graft.sources.Tables.table
import graft.streaming.LmGate
import org.apache.spark.sql.functions._

/** The frozen-LM fluency gate — the streaming twin of the batch
  * bigram-LM score.
  */
class LmGateSpec extends SparkSpec {

  private val threshold = -3.41

  test("scoring the fit corpus under the frozen model ≡ lmScored") {
    val docs = table(spark, sfDir, "documents")
    val (model, unk) = TextAnalysis.lmModel(docs)
    val frozenScores = TextAnalysis
      .lmScoreWith(docs, "doc_id", "text", model, unk)
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"))
      .orderBy("doc_id").collect().toSeq
    // every bigram of the fit corpus is in the model, so the frozen
    // path must reproduce the self-fit path bit-for-bit (same
    // quantized integer sums, same rounding)
    val self = TextAnalysis.lmScored(spark, sfDir)
      .collect().toSeq
    assert(frozenScores.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      == self.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("gate on the fit corpus ≡ the batch lm-score cut; split-invariant") {
    val docs = table(spark, sfDir, "documents")
    val gate = LmGate.fromCorpus(docs, threshold)
    val kept = gate.scrubDocs(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val scores = TextAnalysis.lmScored(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(id => scores.get(id).forall(_ >= threshold)).toSet
    assert(kept == expected,
      s"gate-only=${(kept -- expected).take(5)} batch-only=${(expected -- kept).take(5)}")
    assert(kept.nonEmpty && kept.size < docs.count(),
      s"threshold $threshold keeps ${kept.size} of ${docs.count()} — adjust")
    // micro-batch-boundary invariance under the frozen model
    val a = gate.scrubDocs(docs.filter(col("doc_id") % 2 === 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = gate.scrubDocs(docs.filter(col("doc_id") % 2 =!= 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((a ++ b) == kept)
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("unseen bigrams score at UNK: novel text scores below corpus text") {
    import spark.implicits._
    val docs = table(spark, sfDir, "documents")
    val gate = LmGate.fromCorpus(docs, threshold)
    val novel = Seq((900001L, "zzqx qklm vwpt hjgd nfrb zzqx qklm"))
      .toDF("doc_id", "text")
    // every bigram is out-of-model → avg = UNK = -ln(vocab), far below
    // any in-corpus doc's smoothed average → the gate must drop it
    assert(gate.scrubDocs(novel).count() == 0)
    // and a doc too short to score must pass
    val short = Seq((900002L, "one")).toDF("doc_id", "text")
    assert(gate.scrubDocs(short).count() == 1)
  }
}
