package graft.streaming

import graft.operators.{BloomJoin, Hygiene, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A benchmark-decontamination gate shared across micro-batches:
  * filters a batch's documents against a STATIC benchmark set built
  * once at stream start. Two strengths ship — [[BenchmarkGate]] drops
  * exact copies (normalized-text fingerprint match, bloom-prefiltered)
  * and [[WinnowGate]] drops edit-drifted copies (≥ `minShared` shared
  * winnow fingerprints). Both are pure per-batch filters, so a
  * replayed batch drops the same docs again (the streams' idempotence
  * contract is preserved).
  */
trait DocGate extends Serializable {
  /** Remove benchmark-contaminated rows from raw docs. `idCol` names
    * the document key for gates that score per document (the winnow
    * gate's hit aggregation); fingerprint gates ignore it.
    */
  def scrubDocs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame

  /** Variant for callers that already carry the exact-dup fingerprint
    * column; gates that can't use it just gate on the text.
    */
  def scrubWithFp(docs: DataFrame, fpCol: String,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    scrubDocs(docs, textCol, idCol)
}

object DocGate {
  /** Compose gates left-to-right: a doc must pass EVERY gate (set
    * intersection, so order only affects plan shape, not the result).
    * Lets a stream run decontamination AND selection through the one
    * `Option[DocGate]` slot — e.g. `DocGate.all(BenchmarkGate.fromDocs
    * (bench), DsirGate.fromCorpus(...))`.
    */
  def all(gates: DocGate*): DocGate = new DocGate {
    override def scrubDocs(docs: DataFrame, textCol: String,
        idCol: String): DataFrame =
      gates.foldLeft(docs)((d, g) => g.scrubDocs(d, textCol, idCol))
    override def scrubWithFp(docs: DataFrame, fpCol: String,
        textCol: String, idCol: String): DataFrame =
      gates.foldLeft(docs)((d, g) => g.scrubWithFp(d, fpCol, textCol, idCol))
  }
}

/** Exact-copy gate: docs whose exact-dup fingerprint (md5 of
  * normalized text) matches a benchmark doc are dropped. The Bloom
  * filter over the benchmark fingerprints is built ONCE at
  * construction — every micro-batch then pays a scan-side codegen
  * probe, and only the (rare) bloom-positive docs reach the exact
  * anti-join that restores exact semantics.
  */
final class BenchmarkGate(benchFps: DataFrame) extends DocGate {
  private val fps = benchFps.select("fp")
  private val bloom = BloomJoin.buildBloom(fps, "fp")

  /** Anti-join `docs` on a PRECOMPUTED fingerprint column. */
  def scrub(docs: DataFrame, fpCol: String): DataFrame =
    BloomJoin.bloomAntiJoinWith(docs, fpCol, fps, "fp", bloom)

  override def scrubDocs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    scrub(docs.withColumn("__bm_fp",
      TextAnalysis.fingerprint(col(textCol))), "__bm_fp")
      .drop("__bm_fp")

  override def scrubWithFp(docs: DataFrame, fpCol: String,
      textCol: String, idCol: String): DataFrame = scrub(docs, fpCol)
}

object BenchmarkGate {
  /** Build the gate from raw benchmark documents. */
  def fromDocs(bench: DataFrame, textCol: String = "text"): BenchmarkGate =
    new BenchmarkGate(bench.select(
      TextAnalysis.fingerprint(col(textCol)).as("fp")))
}

/** Edit-robust gate: docs sharing ≥ `minShared` winnowing fingerprints
  * with any benchmark doc are dropped — whitespace changes, case
  * changes, and a few token edits still match (`Hygiene.
  * decontaminateByFingerprint` is the batch-mode scorer this gates
  * on). The benchmark fingerprint set is eval-suite-sized →
  * broadcast; each batch pays one winnow pass over ITS OWN docs only.
  * Docs under the 8-token winnowing floor carry no fingerprints and
  * always pass.
  */
final class WinnowGate(benchFps: DataFrame, minShared: Int = 2)
    extends DocGate {
  // materialize ONCE at construction: without the persist every
  // micro-batch would re-run the benchmark winnow plan just to
  // broadcast it. Deliberately not registered with InternalCaches —
  // the gate outlives every batch scope, and a recompute after
  // eviction is deterministic.
  private val fps = {
    val f = benchFps.select("fp").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f.count()
    f
  }

  override def scrubDocs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val contaminated = Hygiene.fingerprintHits(
        Hygiene.winnowFingerprints(docs, idCol, textCol), idCol, fps)
      .filter(col("n_shared") >= minShared)
      .select(idCol)
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}

object WinnowGate {
  /** Build the gate from raw benchmark documents. */
  def fromDocs(bench: DataFrame, textCol: String = "text",
      minShared: Int = 2): WinnowGate = {
    // no distinct here — the constructor's persist-time distinct is
    // the canonical (and only) dedup pass over the benchmark set
    val fps = Hygiene.winnowFingerprints(
        bench.withColumn("__bm_id", monotonically_increasing_id()),
        "__bm_id", textCol)
      .select(explode(col("fps")).as("fp"))
    new WinnowGate(fps, minShared)
  }
}

/** Selection gate — the streaming twin of `q_dsir_weights`: docs whose
  * PER-TOKEN DSIR log-ratio (how much more likely under the target
  * hashed-unigram model than under the raw one) falls below
  * `minPerTokenLogw` are dropped. The ≤`buckets`-row model is fit ONCE
  * at construction from a reference corpus and frozen; every
  * micro-batch then pays one tokenize pass over ITS OWN docs plus a
  * broadcast join against the fixed model frame — no state grows with
  * the stream, and a replayed batch drops the same docs again (pure
  * per-batch filter, the streams' idempotence contract).
  *
  * The threshold cuts the LENGTH-NORMALIZED weight: the raw total is
  * ∝ n_tokens, so a fixed total cut would just be a length filter.
  */
final class DsirGate(model: DataFrame, minPerTokenLogw: Double,
    buckets: Int = 1024) extends DocGate {
  // materialize once (same rationale as WinnowGate.fps): without the
  // persist every micro-batch re-runs the reference-corpus fit
  private val frozen = {
    val m = model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    m.count()
    m
  }

  override def scrubDocs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val kept = graft.operators.Selection
      .dsirScoreWith(docs, idCol, textCol, frozen, buckets)
      .filter(col("dsir_logw") / col("n_tokens") >= minPerTokenLogw)
      .select(idCol)
    docs.join(kept, Seq(idCol), "left_semi")
  }
}

object DsirGate {
  /** Fit the gate's model from a reference corpus with a target
    * predicate (e.g. `col("source") === "curated"`).
    */
  def fromCorpus(reference: DataFrame, isTarget: org.apache.spark.sql.Column,
      minPerTokenLogw: Double, textCol: String = "text",
      idCol: String = "doc_id", buckets: Int = 1024): DsirGate = {
    val docb = graft.operators.Selection.hashedBucketCounts(
      reference, idCol, textCol, buckets, Seq("__tgt" -> isTarget))
    new DsirGate(
      graft.operators.Selection.dsirModelFrom(docb, buckets),
      minPerTokenLogw, buckets)
  }
}

/** Fluency gate — the streaming twin of the batch LM score
  * (`q_lm_score` / `q_ppl_buckets`' tail cut, the CCNet recipe): docs
  * whose mean bigram log-prob under a FROZEN reference LM falls below
  * `minAvgLogp` are dropped. The model — `TextAnalysis.lmModel`'s
  * scored-bigram table — fits once from a bounded reference corpus;
  * each micro-batch explodes ITS OWN bigrams and joins the frozen
  * table (auto-broadcast when the reference is small, shuffle join
  * when it is not — either way no state grows with the stream).
  * Unseen bigrams score at the UNK constant. Docs under 2 tokens
  * carry no bigram and PASS (the WinnowGate under-floor contract);
  * pure per-batch filter, so replays drop the same docs again.
  */
final class LmGate(model: DataFrame, qlpUnk: Long, minAvgLogp: Double)
    extends DocGate {
  private val frozen = {
    val m = model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    m.count()
    m
  }

  override def scrubDocs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val dropped = TextAnalysis
      .lmScoreWith(docs, idCol, textCol, frozen, qlpUnk)
      .filter(col("avg_logp") < minAvgLogp)
      .select(idCol)
    // anti-join on the DROPPED set so unscoreable (<2-token) docs,
    // absent from the score frame, pass by construction
    docs.join(dropped, Seq(idCol), "left_anti")
  }
}

object LmGate {
  /** Fit the gate's LM from a reference corpus. */
  def fromCorpus(reference: DataFrame, minAvgLogp: Double,
      textCol: String = "text"): LmGate = {
    val (model, qlpUnk) = TextAnalysis.lmModel(reference, textCol)
    new LmGate(model, qlpUnk, minAvgLogp)
  }
}
