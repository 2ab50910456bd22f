package graft.streaming

import graft.operators.WebCorpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL-identity gate against an EXISTING corpus — the streaming twin
  * of `q_url_dedup`'s cross-corpus half, and in a crawl pipeline the
  * FIRST gate in the chain: a re-fetch of a known page (same page
  * under a cased host, a `www.` alias, a tracking-parameter variant…)
  * is dropped by pure per-row string math before any text operator
  * (shingling, LM scoring, embedding) spends a cycle on it.
  *
  * The corpus's canonical-URL set builds ONCE at construction (the
  * persisted frozen index, the MinHashGate contract); every
  * micro-batch canonicalizes only ITS OWN `urlCol` and anti-joins the
  * frozen set. Decisions depend only on (row url, frozen corpus), so
  * replayed batches drop the same rows and micro-batch boundaries are
  * invisible. Rows with a NULL url pass (a null canonical key never
  * equals a set member — the WinnowGate under-floor contract: the
  * gate only asserts about rows it can actually key).
  *
  * At 100 TB the frozen set is corpus-sized, so membership is the
  * BenchmarkGate shape, not a plain anti-join: a broadcast bloom over
  * the canonical keys probes on the scan side (codegen), and only the
  * rare bloom-positive rows reach the exact anti-join that restores
  * exact semantics — a novel page never shuffles at all. Composes
  * with every other gate via `DocGate.all` — URL first, so later
  * gates see only novel pages.
  */
final class UrlGate(corpusUrls: DataFrame, urlCol: String = "url")
    extends DocGate {
  // materialize once at construction (the WinnowGate rationale):
  // deliberately not registered with InternalCaches — the gate
  // outlives every batch scope, and a recompute after eviction is
  // deterministic
  private val seen = {
    val s = corpusUrls
      .select(WebCorpus.canonicalizeUrl(col(urlCol)).as("__canon"))
      .filter(col("__canon").isNotNull).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    s.count(); s
  }
  private val bloom =
    graft.operators.BloomJoin.buildBloom(seen, "__canon")

  override def scrubDocs(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    // null canonical keys (no url) must ROUTE AROUND the probe:
    // might_contain(null) is null, so both bloom branches would
    // silently drop exactly the rows the contract says pass
    val keyed = docs.withColumn("__canon",
      WebCorpus.canonicalizeUrl(col(urlCol)))
    graft.operators.BloomJoin.bloomAntiJoinWith(
        keyed.filter(col("__canon").isNotNull),
        "__canon", seen, "__canon", bloom)
      .unionByName(keyed.filter(col("__canon").isNull))
      .drop("__canon")
  }
}

object UrlGate {
  /** Build the gate from the already-ingested corpus. */
  def fromCorpus(corpus: DataFrame, urlCol: String = "url"): UrlGate =
    new UrlGate(corpus, urlCol)
}
