package graft.pipelines

import graft.QueryDef
import graft.operators.Dedup
import graft.operators.TextAnalysis
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LLM training-corpus preparation pipeline end to end:
  *
  *   quality filter → exact dedup (fingerprint canonical) →
  *   near-dup clusters (MinHash-LSH pairs → connected components) →
  *   keep one canonical doc per cluster → token accounting
  *
  * Each stage is a DataFrame → DataFrame function; the composition is
  * a handful of hash-partitioned shuffles with no driver
  * materialization, so the same plan serves 500 docs or 500 TB.
  */
object Corpus {

  final case class Config(
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.3,
      nearDupJaccard: Double = 0.8)

  /** Quality gate: token floor and punctuation ceiling (the standard
    * pre-training heuristics from TextAnalysis).
    */
  def qualityFilter(docs: DataFrame, cfg: Config): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .withColumn("__n_tokens", size(toks))
      .withColumn("__punct",
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
          .cast("double") / greatest(length(col("text")), lit(1)))
      .filter(col("__n_tokens") >= cfg.minTokens &&
        col("__punct") <= cfg.maxPunctRatio)
      .drop("__n_tokens", "__punct")
  }

  /** Exact dedup: keep the min-id doc per normalized fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = docs
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__fp")
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Near-dedup: LSH pairs → connected components → keep the cluster
    * minimum (the cluster_id IS the canonical id).
    */
  def nearDedup(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol, minJaccard)
    val doomed = Dedup.clusterPairs(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /** The full preparation run, returning the cleaned corpus plus its
    * token accounting.
    */
  def prepare(docs: DataFrame, cfg: Config = Config(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the filtered+exact-deduped corpus feeds three passes (LSH pair
    // generation, the anti join, the final projection) — persist it
    // once instead of recomputing the scan+filter+semi-join chain
    val base = exactDedup(qualityFilter(docs, cfg), idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleaned = nearDedup(base, idCol, textCol, cfg.nearDupJaccard)
    cleaned.withColumn("n_tokens", size(TextAnalysis.tokens(col(textCol))))
  }

  /** End-to-end corpus run. LSH candidate generation is
    * hash-dependent, so this is a rows-only check; every stage's math
    * is oracle-checked separately (q_dedup_exact, q_ngram_jaccard,
    * q_dedup_clusters, q_text_quality).
    */
  def defs: Map[String, QueryDef] = Map(
    "q_corpus_prepare" -> QueryDef(
      (s, dir) => prepare(table(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id"),
      None))
}
