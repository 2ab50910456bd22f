package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image near-dup gate against an EXISTING media corpus — the
  * multimodal sibling of [[MinHashGate]], closing the streaming side
  * of `q_image_phash`: the corpus's perceptual-hash set builds ONCE at
  * construction (decode + aHash over the historical payloads, or
  * cheaper: read back the phash column a batch `q_image_phash`-shaped
  * job already persisted); every micro-batch decodes only ITS OWN
  * payloads (partition-local ImageIO, per-batch cost ∝ batch) and
  * drops rows whose hash matches history — the same equality cut as
  * the batch query's groupBy, so gate and batch agree by
  * construction on re-encoded and rescaled copies.
  *
  * Two inherited boundary cases, both from [[Multimodal.aHash64]]:
  * undecodable payloads produce NO hash and therefore always PASS the
  * gate (a corrupt blob is not evidence of duplication — route those
  * rows to quarantine with a width=0 filter if they must not land);
  * and all-uniform frames share hash 0, so a flat-image corpus member
  * gates ALL flat arrivals (aHash carries no brightness, by design).
  * Decisions depend only on (payload bytes, frozen corpus): replays
  * drop the same rows and micro-batch boundaries are invisible —
  * pinned in MediaGateSpec.
  */
final class PHashGate(corpusHashes: DataFrame) extends Serializable {
  // materialize once at construction (the MinHashGate contract); not
  // InternalCaches-registered — the gate outlives batch scopes and a
  // post-eviction recompute is deterministic
  private val hashes = {
    val h = corpusHashes.toDF("__c_phash").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    h.count(); h
  }

  /** Drop batch rows whose decoded payload pHash matches the corpus. */
  def scrubImages(batch: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val hashed = Multimodal.aHash64(
      Multimodal.decodeImageBatch(batch, idCol, payloadCol)).toDF()
    val doomed = hashed
      .join(hashes, hashed("phash") === col("__c_phash"), "left_semi")
      .select(col("doc_id").as(idCol)).distinct()
    batch.join(doomed, Seq(idCol), "left_anti")
  }
}

object PHashGate {
  /** Build the frozen hash set by decoding the historical corpus. */
  def fromCorpus(corpus: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): PHashGate =
    new PHashGate(Multimodal.aHash64(
      Multimodal.decodeImageBatch(corpus, idCol, payloadCol))
      .toDF().select("phash"))

  /** Build from an already-persisted phash column (the batch job's
    * artifact) — no re-decode of history.
    */
  def fromHashes(hashes: DataFrame): PHashGate = new PHashGate(hashes)
}
