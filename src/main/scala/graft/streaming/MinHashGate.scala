package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup gate against an EXISTING corpus — the streaming twin of
  * `q_dedup_incremental`: the corpus's LSH band and shingle frames
  * build ONCE at construction (the persisted index), and every
  * micro-batch bands only ITSELF, probes the frozen bands for
  * candidates, and drops docs whose exact Jaccard against a matched
  * corpus doc clears the threshold. Per-batch cost ∝ batch + matched
  * buckets — the corpus is never re-hashed, which is what makes
  * near-dedup-vs-history viable on an unbounded stream at all.
  *
  * Verification is the same exact-Jaccard cut as the batch query, so
  * a band collision between non-dups never drops a doc. Decisions
  * depend only on (doc text, frozen corpus): replayed batches drop
  * the same docs (idempotence) and micro-batch boundaries are
  * invisible — both pinned in MinHashGateSpec.
  */
final class MinHashGate(corpusBands: DataFrame, corpusShingles: DataFrame,
    minJaccard: Double) extends DocGate {
  // materialize ONCE at construction (the WinnowGate contract):
  // deliberately not registered with InternalCaches — the gate
  // outlives every batch scope, and a recompute after eviction is
  // deterministic.
  private val bands = {
    val b = corpusBands.toDF("__c_id", "band", "band_key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    b.count(); b
  }
  private val sh = {
    val s = corpusShingles.toDF("__c_id", "__c_sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    s.count(); s
  }

  override def scrubDocs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    // batch-local shingles feed banding AND verification — tracked in
    // the enclosing batch scope so the stream's cache hygiene owns it
    val bsh = graft.InternalCaches.track(
      Dedup.shingled(docs, idCol, textCol).toDF("__b_id", "__b_sh")
        .persist())
    val nb = Dedup.lshBandsFromShingles(
      bsh.toDF("__b_id", "sh"), "__b_id")
    val dropped = nb.join(bands, Seq("band", "band_key"))
      .select("__b_id", "__c_id").distinct()
      .join(bsh, "__b_id")
      .join(sh, "__c_id")
      // same boundary rule as the batch twin q_dedup_incremental:
      // quantize to the 1e-4 grid BEFORE the threshold compare so a
      // pair with raw J in [minJ - 5e-5, minJ) lands on the same side
      // in both paths (gate ≡ batch cut is pinned in MinHashGateSpec)
      .filter(round(Dedup.jaccard(col("__b_sh"), col("__c_sh")), 4)
        >= minJaccard)
      .select(col("__b_id").as(idCol)).distinct()
    docs.join(dropped, Seq(idCol), "left_anti")
  }
}

object MinHashGate {
  /** Build the gate's frozen index from the existing corpus. */
  def fromCorpus(corpus: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minJaccard: Double = 0.25): MinHashGate = {
    val sh = Dedup.shingled(corpus, idCol, textCol)
    new MinHashGate(
      Dedup.lshBandsFromShingles(sh, idCol), sh, minJaccard)
  }
}
