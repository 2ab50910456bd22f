package graft.streaming

import graft.operators.{BloomJoin, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Static benchmark-decontamination gate shared across micro-batches:
  * docs whose exact-dup fingerprint (md5 of normalized text) matches a
  * benchmark doc are dropped before they reach the sink. The Bloom
  * filter over the benchmark fingerprints is built ONCE at
  * construction — every micro-batch then pays a scan-side codegen
  * probe, and only the (rare) bloom-positive docs reach the exact
  * anti-join that restores exact semantics. Exact-copy decontam only:
  * the n-gram / winnow-fingerprint operators (`Hygiene`) are the
  * batch-mode tools for partial contamination, which needs the whole
  * doc scored, not gated row-wise. Used by both streaming dedup
  * pipelines (`CorpusEtlStream`, `CorpusStream`).
  */
final class BenchmarkGate(benchFps: DataFrame) extends Serializable {
  private val fps = benchFps.select("fp")
  private val bloom = BloomJoin.buildBloom(fps, "fp")

  /** Anti-join `docs` on a PRECOMPUTED fingerprint column. */
  def scrub(docs: DataFrame, fpCol: String): DataFrame =
    BloomJoin.bloomAntiJoinWith(docs, fpCol, fps, "fp", bloom)

  /** Anti-join raw docs, deriving the fingerprint from `textCol`. */
  def scrubDocs(docs: DataFrame, textCol: String = "text"): DataFrame =
    scrub(docs.withColumn("__bm_fp",
      TextAnalysis.fingerprint(col(textCol))), "__bm_fp")
      .drop("__bm_fp")
}

object BenchmarkGate {
  /** Build the gate from raw benchmark documents. */
  def fromDocs(bench: DataFrame, textCol: String = "text"): BenchmarkGate =
    new BenchmarkGate(bench.select(
      TextAnalysis.fingerprint(col(textCol)).as("fp")))
}
