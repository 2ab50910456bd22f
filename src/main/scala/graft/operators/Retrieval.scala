package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.functions.FloatDotProduct.fdot
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval-quality evaluation and cross-corpus pair mining over the
  * embedding column — the measurement half of the ANN surface: not
  * "find neighbors" but "how good are the approximate neighbors" and
  * "which cross-side pairs are MUTUALLY nearest".
  */
object Retrieval {

  /** Per-query recall@k of the LSH index against exact brute force:
    * both pipelines run over the same corpus/panel, ground truth
    * semi-joins the approximate set, and every query reports
    * |approx ∩ truth| / k — including the zero-hit queries (the left
    * join back to the panel), which a plain inner-join count would
    * silently drop. This is the eval you run after every index
    * build/re-tune; at 100 TB the truth side runs once on a sampled
    * panel and the approximate side is the index probe being graded.
    */
  def recallAtK(corpus: DataFrame, queries: DataFrame, k: Int,
      index: (DataFrame, DataFrame, Int) => DataFrame =
        Similarity.lshTopK(_, _, _)): DataFrame = {
    val truth = Similarity.bruteForceTopK(corpus, queries, k)
      .select("query_id", "neighbor_id")
    val approx = index(corpus, queries, k)
      .select("query_id", "neighbor_id")
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    queries.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall", round(col("hits") / lit(k.toDouble), 4))
      .orderBy("query_id")
  }

  /** Margin-based cross-corpus pair mining (the CCMatrix/LASER ratio
    * margin, panel-normalized): for each query vector on side A, its
    * best side-B partner scored by
    *   margin(x,y) = cos(x,y) / ((avgₖNN(x) + avgₖNN(y)) / 2)
    * — a pair only survives if it beats BOTH vectors' neighborhood
    * averages (margin > `thresh`), which kills hub vectors that are
    * near everything. Both kNN denominators derive from the ONE A×B
    * score matrix, so the whole statistic is replayable.
    *
    * Determinism contract: cosines quantize to a 1e-6 integer grid
    * BEFORE the top-k averaging, so the denominator sums are integer
    * and order-free (lmScored's quantize-before-summing contract);
    * the final margin is one double division of integers. Shape: side
    * A broadcasts (a label-filtered panel), side B streams — two
    * window shuffles (by query, by pair) over the score matrix, never
    * a corpus-wide shuffle of raw vectors.
    */
  def bitextMargin(corpus: DataFrame, srcLabel: Int, dstLabel: Int,
      k: Int = 4, thresh: Double = 1.0): DataFrame = {
    val a = corpus.filter(col("label") === srcLabel)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
      .withColumn("q_norm", sqrt(fdot(col("q_v"), col("q_v"))))
    val b = spreadScan(corpus.filter(col("label") === dstLabel)
      .select(col("vec_id").as("pair_id"), col("embedding").as("c_v")))
      .withColumn("c_norm", sqrt(fdot(col("c_v"), col("c_v"))))
    // labels partition vec_ids, so the predicate is always true — it
    // exists to mirror bruteForceTopK's broadcast-nested-loop shape
    val scored = b.join(broadcast(a), col("query_id") =!= col("pair_id"))
      .select(col("query_id"), col("pair_id"),
        round(fdot(col("q_v"), col("c_v")) / (col("q_norm") * col("c_norm"))
          * lit(1000000.0)).cast("long").as("qcos"))
    val wq = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("pair_id"))
    val wp = Window.partitionBy("pair_id").orderBy(col("qcos").desc, col("query_id"))
    val byQ = Window.partitionBy("query_id")
    val byP = Window.partitionBy("pair_id")
    val wBest = Window.partitionBy("query_id")
      .orderBy(col("margin").desc, col("pair_id"))
    scored
      .withColumn("rq", row_number().over(wq))
      .withColumn("denq", sum(when(col("rq") <= k, col("qcos"))).over(byQ))
      .withColumn("rp", row_number().over(wp))
      .withColumn("denp", sum(when(col("rp") <= k, col("qcos"))).over(byP))
      .withColumn("margin",
        lit(2.0 * k) * col("qcos") / (col("denq") + col("denp")))
      .withColumn("best", row_number().over(wBest))
      .filter(col("best") === 1 && round(col("margin"), 4) > thresh)
      .select(col("query_id"), col("pair_id"),
        round(col("margin"), 4).as("margin"))
      .orderBy("query_id")
  }

  def defs: Map[String, QueryDef] = Map(
    // Recall@3 of q_ann_lsh's index against q_ann_brute's exact truth
    // for the standard 32-query panel. The oracle replays BOTH
    // pipelines (the hyperplanes are embedded as exact double
    // literals) plus the intersection count, so it catches a recall
    // drift in the index AND a bookkeeping bug in the eval itself.
    "q_recall_at_k" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        recallAtK(e, e.filter(col("vec_id") < 32), k = 3)
      },
      s"""WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bsims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) /
        |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
        |  FROM u q JOIN u c ON q.vec_id < 32 AND c.vec_id != q.vec_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM bsims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 3),
        |sigs AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    CAST(list_sum(list_transform(range(1, 9), i ->
        |      CASE WHEN list_dot_product(v, (${Similarity.planesLit()})[i]) >= 0
        |        THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM u),
        |q AS (
        |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, xor(sig, m) AS bucket
        |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,4,8,16,32,64,128]) AS m) ms
        |  WHERE vec_id < 32),
        |lsims AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(qv, c.v) / (qn * c.nrm) AS cos_raw
        |  FROM q JOIN sigs c ON c.sig = q.bucket AND c.vec_id != query_id),
        |approx AS (
        |  SELECT query_id, neighbor_id FROM lsims
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) <= 3),
        |hits AS (
        |  SELECT t.query_id, count(*) AS hits
        |  FROM truth t JOIN approx a USING (query_id, neighbor_id)
        |  GROUP BY t.query_id)
        |SELECT p.query_id, coalesce(h.hits, 0) AS hits,
        |  round(coalesce(h.hits, 0) / 3.0, 4) AS recall
        |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 32) p
        |LEFT JOIN hits h USING (query_id)
        |ORDER BY query_id""".stripMargin),

    // Mutually-nearest pair mining between label-0 (side A) and
    // label-1 (side B) vectors at ratio-margin > 1.0. The oracle
    // replays the score matrix, both quantized top-4 neighborhood
    // sums, the margin, the per-query argmax, and the threshold — a
    // rank flip, a hub leak, or a denominator drift all hash-mismatch.
    "q_bitext_margin" -> QueryDef(
      (s, dir) =>
        bitextMargin(table(s, dir, "embeddings"), srcLabel = 0, dstLabel = 1),
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |a AS (SELECT vec_id AS query_id, v, sqrt(list_dot_product(v,v)) AS nrm
        |  FROM u WHERE label = 0),
        |b AS (SELECT vec_id AS pair_id, v, sqrt(list_dot_product(v,v)) AS nrm
        |  FROM u WHERE label = 1),
        |scored AS (
        |  SELECT query_id, pair_id,
        |    CAST(round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 1000000)
        |      AS BIGINT) AS qcos
        |  FROM a CROSS JOIN b),
        |s2 AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, pair_id) AS rq,
        |    row_number() OVER (PARTITION BY pair_id ORDER BY qcos DESC, query_id) AS rp
        |  FROM scored),
        |s3 AS (
        |  SELECT *,
        |    CAST(sum(CASE WHEN rq <= 4 THEN qcos END)
        |      OVER (PARTITION BY query_id) AS BIGINT) AS denq,
        |    CAST(sum(CASE WHEN rp <= 4 THEN qcos END)
        |      OVER (PARTITION BY pair_id) AS BIGINT) AS denp
        |  FROM s2),
        |m AS (SELECT query_id, pair_id,
        |  8.0 * qcos / (denq + denp) AS margin FROM s3),
        |best AS (
        |  SELECT query_id, pair_id, margin FROM m
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY margin DESC, pair_id) = 1)
        |SELECT query_id, pair_id, round(margin, 4) AS margin FROM best
        |WHERE round(margin, 4) > 1.0
        |ORDER BY query_id""".stripMargin))
}
