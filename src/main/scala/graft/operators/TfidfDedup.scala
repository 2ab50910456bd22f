package graft.operators

import graft.{InternalCaches, QueryDef}
import graft.functions.FloatDotProduct.fdot
import graft.functions.Functions.{explodeOnce, spreadScan}
import graft.operators.TextAnalysis.{hash32, tokens}
import graft.sources.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup detection through HASHED SIGNED TF-IDF VECTORS — the
  * text→vector bridge for corpora with no embedding model: each doc
  * becomes a 64-dim feature-hashed tf·idf vector (signed hashing, the
  * Weinberger et al. trick that keeps collisions unbiased), and the
  * embedding-dedup machinery (hyperplane-LSH buckets + cosine verify)
  * runs on those vectors verbatim. Catches topical/term-profile
  * near-dups that shingle Jaccard scores low (reordered or heavily
  * paraphrased text keeps its term profile) — the complement of the
  * positional families.
  *
  * Determinism: idf quantizes to the 1/2^10 grid, so every vector
  * component is an INTEGER (Σ ±tf·idf_q — order-free); components
  * stay ≤ ~10^4, dot products ≤ 64·10^8 ≪ 2^53, so every cosine is
  * exact IEEE arithmetic both engines replay. Zero-norm vectors
  * (every term at idf 0) are filtered explicitly — Spark's NaN
  * comparisons are false where DuckDB's total order ranks NaN above
  * everything, so a NaN cosine must never reach the threshold.
  *
  * Scale: one tokenize pass → (doc, bucket) integer sums (map-side
  * combine); the vector frame is 64 doubles/doc; bucketing and verify
  * are the measured q_dedup_embedding_ann shapes.
  */
object TfidfDedup {

  val Dim = 64
  val IdfQ = 1024L

  /** (id, v) — the 64-dim signed-hashed tf·idf vector per doc. */
  def tfidfVectors(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    tfidfVectorsFromTf(InternalCaches.track(
      explodeOnce(docs.select(col(idCol), col(textCol)),
        Seq(col(idCol)), tokens(lower(col(textCol))), "t")
        .groupBy(idCol, "t").agg(count(lit(1)).as("tf"))
        .persist()), idCol)

  /** The vector assembly over an EXISTING (id, t, tf) term-frequency
    * frame — the seam that lets the declared query ride
    * [[SparseRetrieval.postings]]' content-keyed artifact instead of
    * re-tokenizing: the postings index and this dedup share one
    * tokenize pass per corpus (the same lower+split tokenizer, so the
    * frames are identical by construction and the shared oracle
    * re-derives both from scratch). `tf` must arrive persisted; this
    * method fans three aggregates out of it.
    */
  def tfidfVectorsFromTf(tf: DataFrame, idCol: String): DataFrame = {
    val dfq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nd = broadcast(tf.agg(countDistinct(idCol).as("n_docs")))
    val bucket = pmod(hash32(col("t")), lit(Dim.toLong))
    // sign from an independent md5 nibble (hex digit 9 — disjoint
    // from the bucket's digits 1-8)
    val sign = when(
      conv(substring(md5(col("t")), 9, 1), 16, 10).cast("long") % 2 === 0,
      1L).otherwise(-1L)
    val idfq = floor(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
      * IdfQ + lit(0.5)).cast("long")
    tf.join(dfq, "t").crossJoin(nd)
      .select(col(idCol), bucket.as("b"), (sign * col("tf") * idfq).as("c"))
      .groupBy(idCol, "b").agg(sum("c").as("s"))
      .groupBy(idCol)
      .agg(map_from_entries(collect_list(struct(col("b"), col("s")))).as("m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(Dim - 1L)),
          bb => coalesce(element_at(col("m"), bb), lit(0L)).cast("double"))
          .as("v"))
  }

  /** Above-threshold cosine pairs over the hashed vectors via
    * hyperplane-LSH buckets with Hamming-1 multi-probe — the
    * q_dedup_embedding_ann pipeline on derived vectors.
    */
  def tfidfNearDups(docs: DataFrame, idCol: String, textCol: String,
      minCos: Double): DataFrame =
    tfidfNearDupsFromVectors(tfidfVectors(docs, idCol, textCol), idCol, minCos)

  /** The bucket/verify stage over an already-assembled vector frame. */
  def tfidfNearDupsFromVectors(vecs: DataFrame, idCol: String,
      minCos: Double): DataFrame = {
    val planes = Similarity.hyperplanes(8, Dim)
    val sig = Similarity.lshSignature(col("v"), planes)
    val c = InternalCaches.track(
      vecs
        .select(col(idCol), col("v"), sig.as("sig"))
        .withColumn("nrm", sqrt(fdot(col("v"), col("v"))))
        .filter(col("nrm") > 0) // see the NaN note in the scaladoc
        .persist())
    val probes = array(lit(0L) +: (0 until 8).map(i => lit(1L << i)): _*)
    val a = c.select(col(idCol).as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"),
      explode(transform(probes, m => col("sig").bitwiseXOR(m))).as("bucket"))
    val b = c.select(col(idCol).as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"), col("sig").as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (fdot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("cos_raw"))
      .filter(col("cos_raw") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 4).as("cos"))
      .distinct() // multi-probe can surface one pair from two buckets
      .orderBy("id_a", "id_b")
  }

  def defs: Map[String, QueryDef] = Map(
    // Hashed tf-idf near-dup pairs at cos ≥ 0.9. The oracle rebuilds
    // the vectors (same bucket/sign md5 nibbles, same quantized idf),
    // replays the 8-plane signatures with the embedded plane
    // constants, the Hamming-1 probe set, and every cosine — so the
    // recall contract of the bucketing is itself hash-checked, the
    // q_dedup_embedding_ann discipline on derived vectors.
    "q_dedup_tfidf" -> QueryDef(
      // rides the postings artifact (SparseRetrieval's content-keyed
      // index) instead of re-tokenizing: the BM25/RRF/phrase family
      // and this dedup share ONE tokenize pass per corpus — the tf
      // frames are identical by construction (same lower+split
      // tokenizer, same groupBy), and the oracle re-derives the whole
      // chain from raw text so the reuse is hash-checked invisible
      (s, dir) => tfidfNearDupsFromVectors(
        tfidfVectorsFromTf(
          SparseRetrieval.postings(s, dir).withColumnRenamed("term", "t"),
          "doc_id"),
        "doc_id", minCos = 0.9),
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |contrib AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS UINT32) AS BIGINT) % ${Dim} AS b,
        |    (CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS UINT32) % 2 = 0
        |      THEN 1 ELSE -1 END) * tf *
        |      CAST(floor(ln((n_docs + 1.0) / (df + 1.0)) * ${IdfQ} + 0.5) AS BIGINT) AS c
        |  FROM tf JOIN dfq USING (t), nd),
        |vsum AS (SELECT doc_id, b, CAST(sum(c) AS BIGINT) AS s
        |  FROM contrib GROUP BY 1, 2),
        |vec AS (
        |  SELECT doc_id, list_transform(generate_series(0, ${Dim - 1}), bb ->
        |    CAST(coalesce(list_sum(list_transform(prs,
        |      p -> CASE WHEN p[1] = bb THEN p[2] ELSE 0 END)), 0) AS DOUBLE)) AS v
        |  FROM (SELECT doc_id, list([b, s]) AS prs FROM vsum GROUP BY doc_id) z),
        |sigs AS (
        |  SELECT doc_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    CAST(list_sum(list_transform(range(1, 9), i ->
        |      CASE WHEN list_dot_product(v, (${Similarity.planesLit()})[i]) >= 0
        |        THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM vec WHERE sqrt(list_dot_product(v, v)) > 0),
        |a AS (
        |  SELECT doc_id AS id_a, v AS va, nrm AS na, xor(sig, m) AS bucket
        |  FROM sigs CROSS JOIN (SELECT unnest([0,1,2,4,8,16,32,64,128]) AS m) ms)
        |SELECT DISTINCT id_a, c.doc_id AS id_b,
        |  round(list_dot_product(va, c.v) / (na * c.nrm), 4) AS cos
        |FROM a JOIN sigs c ON c.sig = a.bucket AND id_a < c.doc_id
        |WHERE list_dot_product(va, c.v) / (na * c.nrm) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin))
}
