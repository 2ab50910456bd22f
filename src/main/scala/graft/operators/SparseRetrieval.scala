package graft.operators

import graft.{InternalCaches, QueryDef}
import graft.functions.Functions.{explodeOnce, spreadScan}
import graft.operators.TextAnalysis.tokens
import graft.sources.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Sparse (lexical) retrieval over the document corpus: BM25 scoring
  * for a fixed multi-term query panel, and reciprocal-rank fusion of
  * two sparse rankers — the lexical half of a hybrid RAG retrieval
  * stack (the dense half is the ANN family in [[Similarity]]; RRF
  * composes over any mix of rankers the same way).
  *
  * Determinism contract: every per-(query, doc, term) score quantizes
  * to a 1e-6 integer grid BEFORE the per-document sum, so the
  * variable-arity additions are integer and order-free (lmScored's
  * quantize-before-summing contract); `avgdl` is one double division
  * of two exact integers. The oracle replays scoring, ranking, and
  * fusion bit for bit.
  *
  * Scale shape: ONE tokenize pass builds the (doc, term, tf) postings
  * frame, persisted to feed document frequency, document length, and
  * the panel join — the panel and per-term df broadcast; only the
  * postings themselves (∝ corpus) ever shuffle.
  */
object SparseRetrieval {

  /** Fixed benchmark panel: 4 queries, 2-3 terms each, drawn from the
    * corpus vocabulary.
    */
  val panel: Seq[(Long, String)] = Seq(
    0L -> "hash", 0L -> "join",
    1L -> "scan", 1L -> "filter", 1L -> "slow",
    2L -> "vector", 2L -> "stream",
    3L -> "merge", 3L -> "sort", 3L -> "batch")

  val K1 = 1.2
  val B = 0.75

  /** The (doc_id, term, tf) postings frame — a lexical INDEX, so it
    * persists as a content-keyed artifact (the memoShingles pattern):
    * built from one tokenize pass on first touch, read back by every
    * later ranker in this or any process. Three in-plan consumers
    * (df, dl, panel join) additionally share a session cache over the
    * artifact read — without it Catalyst re-plans the read per
    * consumer.
    */
  private[operators] def postings(s: SparkSession, dir: String): DataFrame = {
    val cache = graft.sources.DerivedCache.dirFor(
      s, s"$dir/documents.parquet", "postings")
    if (!graft.sources.DerivedCache.isComplete(s, cache))
      explodeOnce(spreadScan(table(s, dir, "documents")),
        Seq(col("doc_id")), tokens(lower(col("text"))), "term")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(cache)
    InternalCaches.track(
      graft.sources.DerivedCache.read(s, cache).persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** (query_id, doc_id, s6) quantized per-document scores for the
    * panel under `termScore` (a 1e-6-grid integer per posting).
    */
  private def scoredDocs(s: SparkSession, dir: String, tf: DataFrame,
      bm25: Boolean): DataFrame = {
    import s.implicits._
    val qterms = panel.toDF("query_id", "term")
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N and avgdl both derive from the postings cache (N = docs scored,
    // the standard BM25 convention) — no second corpus scan
    val stats = broadcast(dl.agg(count(lit(1)).cast("long").as("n_docs"),
        sum("dl").cast("long").as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl") * lit(1.0) / col("n_docs")).as("avgdl")))
    val idfBm = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score =
      if (bm25)
        idfBm * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) *
            (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl")))
      else
        col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
    tf.join(broadcast(qterms), "term")
      .join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(stats)
      .select(col("query_id"), col("doc_id"),
        round(lit(1000000.0) * score).cast("long").as("s6"))
      .groupBy("query_id", "doc_id").agg(sum("s6").as("s6"))
  }

  /** BM25 top-k per panel query (k1=1.2, b=0.75, Lucene-style
    * +1-smoothed idf).
    */
  def bm25TopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("s6").desc, col("doc_id"))
    scoredDocs(s, dir, postings(s, dir), bm25 = true)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("s6") / lit(1000000.0), 4).as("score"))
      .orderBy("query_id", "doc_id")
  }

  /** Reciprocal-rank fusion (k=60) of the BM25 and tf-idf rankers'
    * top-20 lists; a document surfacing in only one list contributes
    * that single reciprocal term.
    */
  def rrfFuse(s: SparkSession, dir: String, topPer: Int, out: Int): DataFrame = {
    val tf = postings(s, dir)
    def ranked(bm25: Boolean): DataFrame = {
      val w = Window.partitionBy("query_id").orderBy(col("s6").desc, col("doc_id"))
      scoredDocs(s, dir, tf, bm25)
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= topPer)
        .select(col("query_id"), col("doc_id"), col("r"))
    }
    val bm = ranked(bm25 = true).withColumnRenamed("r", "r_bm")
    val ti = ranked(bm25 = false).withColumnRenamed("r", "r_ti")
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    bm.join(ti, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("r_bm")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_ti")), lit(0.0))).as("rrf"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= out)
      .select(col("query_id"), col("doc_id"), round(col("rrf"), 6).as("rrf"))
      .orderBy("query_id", "doc_id")
  }

  /** Shared oracle prelude: panel, postings, df, dl, corpus stats. */
  private def preludeSql: String = {
    val values = panel.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM (VALUES $values) v(query_id, term)),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs FROM dl),
       |avg_ AS (SELECT CAST(sum(dl) AS BIGINT) * 1.0 /
       |  (SELECT n_docs FROM st) AS avgdl FROM dl),
       |bm AS (
       |  SELECT query_id, tf.doc_id,
       |    CAST(round(1000000 * ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
       |      (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avg_.avgdl)))
       |      AS BIGINT) AS s6
       |  FROM q JOIN tf USING (term) JOIN df USING (term)
       |    JOIN dl ON dl.doc_id = tf.doc_id, st, avg_),
       |ti AS (
       |  SELECT query_id, tf.doc_id,
       |    CAST(round(1000000 * tf.tf * ln((st.n_docs + 1.0) / (df.df + 1.0)))
       |      AS BIGINT) AS s6
       |  FROM q JOIN tf USING (term) JOIN df USING (term), st)""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(
    // BM25 top-10 per panel query. The oracle replays tokenize → tf/df
    // /dl → idf → the saturation term → quantize → sum → rank, so a
    // drift in any constant, the smoothing, or the tie order
    // hash-mismatches.
    "q_bm25" -> QueryDef(
      (s, dir) => bm25TopK(s, dir, k = 10),
      s"""$preludeSql,
         |agg AS (SELECT query_id, doc_id, CAST(sum(s6) AS BIGINT) AS s6
         |  FROM bm GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(s6 / 1000000.0, 4) AS score
         |FROM agg
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY s6 DESC, doc_id) <= 10
         |ORDER BY query_id, doc_id""".stripMargin),

    // Reciprocal-rank fusion of the BM25 and tf-idf top-20 lists,
    // top-5 fused per query. Checks both rankers AND the fusion
    // bookkeeping (full-outer rank join, absent-list zero terms).
    "q_rrf_fuse" -> QueryDef(
      (s, dir) => rrfFuse(s, dir, topPer = 20, out = 5),
      s"""$preludeSql,
         |bmrank AS (
         |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(sum(s6) AS BIGINT) DESC, doc_id) AS r
         |  FROM bm GROUP BY query_id, doc_id QUALIFY r <= 20),
         |tirank AS (
         |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(sum(s6) AS BIGINT) DESC, doc_id) AS r
         |  FROM ti GROUP BY query_id, doc_id QUALIFY r <= 20),
         |fused AS (
         |  SELECT coalesce(b.query_id, t.query_id) AS query_id,
         |    coalesce(b.doc_id, t.doc_id) AS doc_id,
         |    coalesce(1.0 / (60 + b.r), 0) + coalesce(1.0 / (60 + t.r), 0) AS rrf
         |  FROM bmrank b FULL OUTER JOIN tirank t
         |    ON b.query_id = t.query_id AND b.doc_id = t.doc_id)
         |SELECT query_id, doc_id, round(rrf, 6) AS rrf FROM fused
         |QUALIFY row_number() OVER (PARTITION BY query_id
         |  ORDER BY rrf DESC, doc_id) <= 5
         |ORDER BY query_id, doc_id""".stripMargin))
}
