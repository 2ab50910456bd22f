package graft.operators

import graft.QueryDef
import graft.operators.Dedup._
import graft.sources.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dedup (probe an existing index with an arriving
  * batch) and asymmetric containment dedup — the two dedup shapes the
  * symmetric whole-corpus queries don't cover:
  *
  *  - A production corpus doesn't re-dedup itself per ingest; each
  *    arriving batch is checked AGAINST WHAT EXISTS. The incremental
  *    query bands only the batch (batch-sized work) and probes the
  *    persisted corpus band index — per-ingest cost ∝ batch + matched
  *    buckets, never corpus re-hash. The freshly-computed batch bands
  *    and the memoized corpus bands are the same deterministic
  *    function of the text, so probing memo against fresh is exact.
  *
  *  - Jaccard misses a short document pasted inside a long one (the
  *    union dilutes the score); containment |A∩B| / min(|A|,|B|)
  *    is the standard quote/subset detector (Broder's resemblance
  *    vs containment distinction). Rides the SAME posting-list
  *    counting join as q_ngram_jaccard — intersection and both set
  *    sizes are already on the counted row; only the final ratio
  *    differs.
  */
object DedupIncremental {

  /** Docs in the synthetic "arriving batch": doc_id ≡ 9 (mod 10). */
  private def isNew = col("doc_id") % 10 === 9

  /** Near-duplicate (new_id, old_id, jac) pairs of the arriving batch
    * against the existing corpus: fresh LSH bands for the batch,
    * persisted bands for the corpus, bucket-join candidates, exact
    * Jaccard verify against the persisted shingle artifact.
    */
  def incrementalNearDups(s: SparkSession, dir: String,
      minJaccard: Double): DataFrame = {
    val newDocs = table(s, dir, "documents").filter(isNew)
    val newBands = lshBands(newDocs, "doc_id", "text")
      .toDF("new_id", "band", "band_key")
    val oldBands = memoBands(s, dir).filter(!isNew)
      .toDF("old_id", "band", "band_key")
    val sh = memoShingles(s, dir)
    newBands.join(oldBands, Seq("band", "band_key"))
      .select("new_id", "old_id").distinct()
      .join(sh.toDF("new_id", "sh_n"), "new_id")
      .join(sh.toDF("old_id", "sh_o"), "old_id")
      .select(col("new_id"), col("old_id"),
        round(jaccard(col("sh_n"), col("sh_o")), 4).as("jac"))
      .filter(col("jac") >= minJaccard)
      .orderBy("new_id", "old_id")
  }

  /** Containment pairs over the df-capped posting space: pairs whose
    * intersection covers ≥ `minContainment` of the SMALLER shingle
    * set (with a floor on that set so trivial two-shingle docs don't
    * all "contain"). The threshold compare is integer × one double —
    * `∩ ≥ t·min(na, nb)` — so no division boundary ambiguity; the
    * emitted ratio is one exact-integer IEEE division, rounded.
    */
  def containmentPairs(docs: DataFrame, minContainment: Double,
      minSmall: Long): DataFrame = {
    val scored = jaccardScored(shingled(docs, "doc_id", "text"), "doc_id")
    scored
      .filter(least(col("__na"), col("__nb")) >= minSmall)
      .filter(col("__inter") >=
        least(col("__na"), col("__nb")) * minContainment)
      .select(col("id_a"), col("id_b"),
        round(col("__inter") * lit(1.0) / least(col("__na"), col("__nb")), 4)
          .as("containment"),
        // which side is the contained (drop-candidate) doc: the
        // smaller set; size tie → the larger id drops
        when(col("__na") < col("__nb"), col("id_a"))
          .when(col("__nb") < col("__na"), col("id_b"))
          .otherwise(greatest(col("id_a"), col("id_b"))).as("contained_id"))
      .orderBy("id_a", "id_b")
  }

  /** The minhash-banding CTE chain over a doc set, shared verbatim
    * with q_dedup_minhash's oracle (same hash params, same band keys)
    * but parameterized by the source predicate.
    */
  private def bandsSql(pred: String): String =
    s"""sh$pred AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')) - 2),
       |    i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
       |         regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
       |         regexp_split_to_array(trim(text), '\\s+')[i+2])) AS g
       |  FROM documents WHERE doc_id % 10 ${if (pred == "n") "=" else "!="} 9),
       |h$pred AS (
       |  SELECT doc_id, list_transform(g,
       |    s2 -> CAST(CAST(('0x' || substr(md5(s2), 1, 8)) AS UINT32) AS BIGINT)) AS hs
       |  FROM sh$pred),
       |sig$pred AS (
       |  SELECT doc_id, list_transform(${paramsLit},
       |    p -> list_min(list_transform(hs,
       |      x -> (x * p[1] + p[2]) % ${P}))) AS sig
       |  FROM h$pred WHERE len(hs) > 0),
       |bands$pred AS (
       |  SELECT doc_id, k AS band,
       |    CAST(sig[2*k+1] AS VARCHAR) || ':' || CAST(sig[2*k+2] AS VARCHAR) AS band_key
       |  FROM sig$pred CROSS JOIN (SELECT unnest(range(0, ${Bands})) AS k) ks)""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    // Arriving-batch (doc_id % 10 = 9) near-dups against the rest of
    // the corpus. The oracle re-derives BOTH band sets from scratch
    // and replays the cross-set bucket join and the Jaccard verify —
    // so the memoized-artifact probe must be indistinguishable from a
    // full recomputation, the same reuse-is-invisible contract as the
    // _indexed ANN twins.
    "q_dedup_incremental" -> QueryDef(
      (s, dir) => incrementalNearDups(s, dir, minJaccard = 0.25),
      s"""WITH ${bandsSql("n")},
         |${bandsSql("o")},
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         |  FROM bandsn n JOIN bandso o
         |    ON n.band = o.band AND n.band_key = o.band_key),
         |scored AS (
         |  SELECT new_id, old_id,
         |    round(len(list_intersect(sn.g, so.g)) * 1.0 /
         |      greatest(len(list_distinct(sn.g || so.g)), 1), 4) AS jac
         |  FROM cand
         |  JOIN shn sn ON sn.doc_id = new_id
         |  JOIN sho so ON so.doc_id = old_id)
         |SELECT new_id, old_id, jac FROM scored WHERE jac >= 0.25
         |ORDER BY new_id, old_id""".stripMargin),

    // Containment ≥ 0.5 over smaller sets of ≥ 20 shingles, df-capped
    // posting space. The oracle replays the df cap, the pruned-space
    // sizes, the integer threshold, the ratio, and the contained-side
    // choice (size tie → larger id drops).
    "q_containment" -> QueryDef(
      (s, dir) => containmentPairs(table(s, dir, "documents"),
        minContainment = 0.5, minSmall = 20L),
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |  FROM documents),
         |pg AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(t) - 2),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
         |  FROM toks),
         |df AS (SELECT g, count(*) AS df FROM pg GROUP BY 1),
         |inv AS (SELECT doc_id, pg.g FROM pg JOIN df USING (g)
         |  WHERE df <= ${StopShingleDf}),
         |sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT id_a, id_b, inter, na.n AS na, nb.n AS nb
         |  FROM pairs
         |  JOIN sizes na ON na.doc_id = id_a
         |  JOIN sizes nb ON nb.doc_id = id_b
         |  WHERE least(na.n, nb.n) >= 20
         |    AND inter >= least(na.n, nb.n) * 0.5)
         |SELECT id_a, id_b,
         |  round(inter * 1.0 / least(na, nb), 4) AS containment,
         |  CASE WHEN na < nb THEN id_a WHEN nb < na THEN id_b
         |    ELSE greatest(id_a, id_b) END AS contained_id
         |FROM sc ORDER BY id_a, id_b""".stripMargin))
}
