package graft

import graft.operators.Selection
import graft.sources.Tables.table
import graft.streaming.{BenchmarkGate, DocGate, DsirGate}
import org.apache.spark.sql.functions._

/** The DSIR selection gate — the streaming twin of q_dsir_weights —
  * and the DocGate composition combinator.
  */
class DsirGateSpec extends SparkSpec {

  private val threshold = -0.47

  test("gate on the fit corpus ≡ the batch dsirWeights cut") {
    val docs = table(spark, sfDir, "documents")
    val gate = DsirGate.fromCorpus(docs, col("source") === "src0", threshold)
    val kept = gate.scrubDocs(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = Selection.dsirWeights(docs, "doc_id", "text",
        col("source") === "src0")
      .filter(col("dsir_logw") / col("n_tokens") >= threshold)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expected,
      s"gate-only=${(kept -- expected).take(5)} batch-only=${(expected -- kept).take(5)}")
    // the fixture must exercise both directions or the test is vacuous
    assert(kept.nonEmpty && kept.size < docs.count(),
      s"threshold $threshold keeps ${kept.size} of ${docs.count()} — adjust")
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("frozen model: decisions are invariant to micro-batch boundaries") {
    val docs = table(spark, sfDir, "documents")
    val gate = DsirGate.fromCorpus(docs, col("source") === "src0", threshold)
    val whole = gate.scrubDocs(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // split into two "micro-batches" — per-batch scrubs must union to
    // the whole-corpus scrub exactly (the model is frozen, and unlike
    // the self-fit batch operator, a batch's OWN composition cannot
    // move its docs' scores)
    val a = gate.scrubDocs(docs.filter(col("doc_id") % 2 === 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = gate.scrubDocs(docs.filter(col("doc_id") % 2 =!= 0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((a ++ b) == whole)
    assert(a.forall(_ % 2 == 0) && b.forall(_ % 2 != 0))
  }

  test("unseen-vocabulary docs are scored at the constant, never " +
      "silently dropped; n_tokens counts unseen tokens") {
    import spark.implicits._
    val docs = table(spark, sfDir, "documents")
    // fully out-of-vocabulary text: every token hashes to buckets the
    // reference corpus may never have populated
    val novel = Seq((900001L, "qqxjz wvmpt hkkgd nnfrb qqxjz llsww"))
      .toDF("doc_id", "text")
    // a sparse model would drop this doc from the scoring inner join —
    // with the full-bucket model it must survive a permissive gate
    val permissive = DsirGate.fromCorpus(docs, col("source") === "src0",
      Double.MinValue)
    assert(permissive.scrubDocs(novel).count() == 1,
      "unseen-vocab doc vanished instead of being scored")
    // and its score must be the balanced-reference constant with the
    // right token count, not a partial sum
    val model = spark.read.parquet(
      graft.operators.Selection.ensureDsirModel(spark, sfDir))
    val scored = graft.operators.Selection
      .dsirScoreWith(novel, "doc_id", "text", model).head()
    assert(scored.getLong(1) == 6, s"n_tokens ${scored.getLong(1)} != 6")
    assert(!scored.isNullAt(2) && !scored.getDouble(2).isNaN)
    InternalCaches.drain()
    spark.catalog.clearCache()
  }

  test("DocGate.all composes to the intersection of its gates") {
    val docs = table(spark, sfDir, "documents")
    // benchmark gate: exact copies of 10 sampled docs; dsir gate as above
    val bench = docs.filter(col("doc_id") % 50 === 0).select("text")
    val bm = BenchmarkGate.fromDocs(bench)
    val ds = DsirGate.fromCorpus(docs, col("source") === "src0", threshold)
    val composed = DocGate.all(bm, ds).scrubDocs(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sep1 = bm.scrubDocs(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val sep2 = ds.scrubDocs(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(composed == (sep1 intersect sep2))
    // both gates must bite for the intersection check to mean anything
    assert(sep1 != sep2 && composed.size < sep1.size.min(sep2.size) + 1)
  }
}
