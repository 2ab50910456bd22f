package graft.pipelines

import graft.QueryDef
import graft.functions.Functions.spreadScan
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

  /** Near-dup pair generation strategy — both are 100 TB shapes with
    * different contracts:
    *  - MinhashLsh: probabilistic banding; cost independent of shingle
    *    df distribution, may miss a pair with probability
    *    (1-J²)^bands (negligible at J ≥ 0.8);
    *  - ExactPostingLists: exact on the stop-shingle-pruned space
    *    (shingles above the df ceiling never count toward candidacy
    *    OR similarity) for any threshold > 0, via the counting join;
    *    cost is Σ df² over surviving shingles.
    */
  sealed trait PairStrategy
  case object MinhashLsh extends PairStrategy
  case object ExactPostingLists extends PairStrategy

  final case class Config(
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.3,
      nearDupJaccard: Double = 0.8,
      pairStrategy: PairStrategy = MinhashLsh,
      // optional trained gate: keep docs whose QualityModel
      // probability (frozen weights) is at least this
      minModelScore: Option[Double] = None)

  /** Quality gate: token floor and punctuation ceiling (the standard
    * pre-training heuristics from TextAnalysis), plus — when
    * `cfg.minModelScore` is set — the trained QualityModel
    * probability gate. All per-row column math, no shuffle.
    */
  def qualityFilter(docs: DataFrame, cfg: Config): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val base = docs
      .withColumn("__n_tokens", size(toks))
      .withColumn("__punct",
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", ""))
          .cast("double") / greatest(length(col("text")), lit(1)))
      .filter(col("__n_tokens") >= cfg.minTokens &&
        col("__punct") <= cfg.maxPunctRatio)
      .drop("__n_tokens", "__punct")
    cfg.minModelScore.fold(base) { t =>
      import graft.operators.QualityModel
      base
        .withColumn("__toks", toks)
        .filter(QualityModel.probability(
          QualityModel.score(col("text"), col("__toks"))) >= t)
        .drop("__toks")
    }
  }

  /** Exact dedup: keep the min-id doc per normalized fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = docs
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__fp")
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Near-dedup: candidate pairs (strategy-chosen) → connected
    * components → keep the cluster minimum (the cluster_id IS the
    * canonical id).
    */
  def nearDedup(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double,
      strategy: PairStrategy = MinhashLsh): DataFrame = {
    val pairs = strategy match {
      case MinhashLsh =>
        Dedup.minhashNearDups(docs, idCol, textCol, minJaccard)
      case ExactPostingLists =>
        Dedup.jaccardPairs(
          Dedup.shingled(docs, idCol, textCol), idCol, minJaccard)
    }
    nearDedupFromPairs(docs, idCol, pairs)
  }

  /** Near-dedup from an already-generated pair frame (id_a, id_b):
    * connected components → drop everything but the cluster minimum.
    */
  def nearDedupFromPairs(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
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
    // once instead of recomputing the scan+filter+semi-join chain.
    // Spread FIRST: a small single-file source scans as one
    // partition, and the quality regexes + fingerprint md5 would run
    // on one core of the cluster (measured 3.8 s of the sf0.1 run).
    // spreadScan keeps this a no-op on a many-split corpus scan.
    val base = graft.InternalCaches.track(
      exactDedup(qualityFilter(spreadScan(docs), cfg), idCol, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cleaned = nearDedup(base, idCol, textCol, cfg.nearDupJaccard, cfg.pairStrategy)
    cleaned.withColumn("n_tokens", size(TextAnalysis.tokens(col(textCol))))
  }

  /** [[prepare]] against a source DIRECTORY, with the MinHash banding
    * served from the memoized per-doc artifacts
    * (`Dedup.minhashNearDupsCached`) instead of re-hashing the
    * filtered corpus — identical results (banding is per-row), and the
    * 64-minhash signature pass, the pipeline's hottest stage, is paid
    * once per source ever rather than once per run.
    */
  def prepareCached(s: org.apache.spark.sql.SparkSession, dir: String,
      cfg: Config = Config()): DataFrame = {
    require(cfg.pairStrategy == MinhashLsh,
      "cached signatures exist for the MinHash strategy only")
    val base = graft.InternalCaches.track(
      exactDedup(qualityFilter(
          spreadScan(table(s, dir, "documents")), cfg), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pairs = Dedup.minhashNearDupsCached(
      s, dir, base, "doc_id", cfg.nearDupJaccard)
    nearDedupFromPairs(base, "doc_id", pairs)
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
  }

  /** End-to-end corpus run, oracle-checked stage by stage: quality
    * gate → min-id exact dedup → the SAME portable MinHash-LSH
    * candidate generation the engine runs (md5-prefix base hash,
    * permutation params as literals) → recursive-CTE connected
    * components → anti-join survivors. A drift anywhere in the
    * pipeline — filter math, fingerprint, banding, clustering —
    * hash-mismatches the final (doc_id, n_tokens) surface.
    */
  /** The DuckDB replay of [[prepareCached]] as a CTE chain ending in
    * `doomed` (near-dup losers); consumers append their own final
    * SELECT over `ded` minus `doomed` — shared by q_corpus_prepare and
    * q_corpus_pack so the two oracles can never drift apart.
    */
  private def cleanedOracleCte: String =
      s"""WITH RECURSIVE base AS (
        |  SELECT doc_id, text,
        |    len(regexp_split_to_array(trim(text), '\\s+')) AS ntok,
        |    length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0 /
        |      greatest(length(text), 1) AS punct
        |  FROM documents),
        |q AS (SELECT doc_id, text FROM base WHERE ntok >= 5 AND punct <= 0.3),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM q
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
        |ded AS (SELECT q.doc_id, q.text FROM q JOIN keep USING (doc_id)),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
        |    i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
        |         regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
        |         regexp_split_to_array(trim(text), '\\s+')[i+2])) AS g
        |  FROM ded),
        |h AS (
        |  SELECT doc_id, list_transform(g,
        |    s2 -> CAST(CAST(('0x' || substr(md5(s2), 1, 8)) AS UINT32) AS BIGINT)) AS hs
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id, list_transform(${Dedup.paramsLit},
        |    p -> coalesce(list_min(list_transform(hs,
        |      x -> (x * p[1] + p[2]) % ${Dedup.P})),
        |      ${Dedup.P})) AS sig
        |  FROM h),
        |bands AS (
        |  SELECT doc_id, k AS band,
        |    CAST(sig[2*k+1] AS VARCHAR) || ':' || CAST(sig[2*k+2] AS VARCHAR) AS band_key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, ${Dedup.Bands})) AS k) ks),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE round(len(list_intersect(sa.g, sb.g)) * 1.0 /
        |      greatest(len(list_distinct(sa.g || sb.g)), 1), 4) >= 0.8),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |walk(id, label) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id),
        |doomed AS (
        |  SELECT id FROM (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id)
        |  WHERE id <> cluster_id)""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "q_corpus_prepare" -> QueryDef(
      (s, dir) => prepareCached(s, dir)
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id"),
      s"""$cleanedOracleCte
        |SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        |FROM ded WHERE doc_id NOT IN (SELECT id FROM doomed)
        |ORDER BY doc_id""".stripMargin),

    // The end of the training-data flow: pack the CLEANED corpus
    // (quality → exact dedup → near-dedup survivors) into
    // fixed-capacity sequences — prepare and Packing composed in one
    // declared plan. The oracle replays the whole chain (the shared
    // CTE above) plus the packing windows, so a drift in EITHER stage
    // or in how they compose hash-mismatches.
    "q_corpus_pack" -> QueryDef(
      (s, dir) => graft.operators.Packing.packSequences(
          prepareCached(s, dir), "doc_id", "text",
          seqTokens = 256, nShards = 8)
        .orderBy("doc_id"),
      s"""$cleanedOracleCte,
        |cleaned AS (
        |  SELECT doc_id, text FROM ded
        |  WHERE doc_id NOT IN (SELECT id FROM doomed)),
        |t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
        |      AS n_toks
        |  FROM cleaned),
        |o AS (
        |  SELECT doc_id, shard, n_toks,
        |    CAST(coalesce(sum(n_toks + 1) OVER (PARTITION BY shard
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM t)
        |SELECT doc_id, shard, n_toks, start_off,
        |  start_off // 256 AS first_seq,
        |  (start_off + n_toks - 1) // 256 AS last_seq
        |FROM o ORDER BY doc_id""".stripMargin),

    // Corpus data card: the per-source / per-lang / per-cell summary a
    // dataset report ships — doc counts, token volume, average doc
    // size — in ONE grouping-sets pass (one shuffle, partial-agg
    // map-side; a cell, a row-margin, and a column-margin sweep would
    // otherwise scan the corpus three times).
    "q_corpus_card" -> QueryDef(
      (s, dir) => {
        val d = table(s, dir, "documents")
        d.groupingSets(
            Seq(Seq(col("source")), Seq(col("lang")),
              Seq(col("source"), col("lang"))),
            col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(TextAnalysis.tokens(col("text")))).as("n_tokens"),
            round(avg(col("n_chars")), 4).as("avg_chars"))
          // margin rows carry NULL source/lang; pin null order on both
          // sides (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST)
          .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
      },
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |    AS n_tokens,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((source), (lang), (source, lang))
        |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin))
}
