package graft.operators

import graft.{InternalCaches, QueryDef}
import graft.functions.Functions.{explodeOnce, spreadScan}
import graft.operators.TextAnalysis.tokens
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus collocation mining and positional phrase search — the
  * lexical-statistics operators a training-data pipeline uses to
  * build phrase vocabularies (PMI-scored adjacent pairs, the classic
  * collocation measure) and to probe a corpus for fixed multi-token
  * phrases (benchmark-contamination strings, boilerplate markers)
  * with POSITION-aware matching rather than bag-of-words co-occurrence.
  *
  * Determinism contract: every PMI is a single `ln` of one exact
  * integer ratio — no variable-arity double sums anywhere — quantized
  * to the 1e-6 grid before ranking (the BM25 convention), so rank
  * order and the displayed score are engine-portable.
  *
  * Scale shape: ONE tokenize pass feeds each operator. PMI's joins are
  * all vocabulary-sized (≪ corpus) after the min-count cut; phrase
  * matching is postings ⨝ broadcast panel → one narrow groupBy — the
  * corpus-sized postings frame shuffles once on (phrase, doc, start).
  */
object Collocations {

  /** PMI over ADJACENT bigram events: P(w1,w2)=c12/N against the
    * positional marginals P(w1·)=c1/N, P(·w2)=c2/N where N = total
    * bigram positions — the event space is "a bigram slot", so the
    * marginals derive from the bigram aggregate itself and the corpus
    * is tokenized exactly once. Pairs below `minCount` are noise (PMI
    * explodes for hapax pairs) and are cut before the marginal joins.
    * Returns the top-`k` pairs by quantized PMI, ordered (w1, w2).
    */
  def pmiPairs(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    val toksF = docs
      .select(tokens(lower(col("text"))).as("__t"))
      .filter(size(col("__t")) >= 2)
    val n = size(col("__t"))
    val bigrams = zip_with(
      slice(col("__t"), lit(1), n - 1), slice(col("__t"), lit(2), n - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    // c12 persists: the two marginal rollups and the total all derive
    // from it (lmScored's corpus-scan-free marginal trick) — without
    // the persist each consumer re-runs tokenize+explode+agg
    val c12 = InternalCaches.track(
      explodeOnce(toksF, Seq.empty, bigrams, "__bg")
        .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val c2 = c12.groupBy("w2").agg(sum("c12").as("c2"))
    val nTot = broadcast(c12.agg(sum("c12").cast("long").as("n_bg")))
    // cast each count to double BEFORE multiplying: c1*c2 can reach
    // n_bg² and overflow int64 on a web-scale corpus (ANSI throw),
    // while the double products stay exact up to 2^53 and identically
    // rounded beyond — still one correctly-rounded IEEE divide into a
    // single ln, quantized to the 1e-6 grid BEFORE ranking so ties and
    // order are engine-portable
    val pmi = log((col("c12").cast("double") * col("n_bg").cast("double")) /
      (col("c1").cast("double") * col("c2").cast("double")))
    c12.filter(col("c12") >= minCount)
      // marginal frames are vocabulary-sized; at web scale they exceed
      // a broadcast but the join keys are the filtered pair list
      // (vocab², pre-cut) — never the corpus
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(nTot)
      .select(col("w1"), col("w2"), col("c12"),
        round(lit(1000000.0) * pmi).cast("long").as("s6"))
      .orderBy(col("s6").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c12"),
        round(col("s6") / lit(1000000.0), 4).as("pmi"))
      .orderBy("w1", "w2")
  }

  /** Fixed phrase panel: (phrase_id, position-in-phrase, term, phrase
    * length). A 3-term phrase exercises the arbitrary-length chain.
    */
  val phrasePanel: Seq[(Long, Int, String, Int)] = Seq(
    (0L, 0, "hash", 2), (0L, 1, "join", 2),
    (1L, 0, "table", 2), (1L, 1, "scan", 2),
    (2L, 0, "sort", 3), (2L, 1, "merge", 3), (2L, 2, "batch", 3))

  /** Positional phrase search: a phrase matches at `start` iff every
    * (pip, term) of the panel row set appears at `start + pip`. One
    * postings ⨝ broadcast-panel join keyed on the term, then a
    * group-by on (phrase, doc, start) counting DISTINCT phrase
    * positions seen — equal to the phrase length exactly at true
    * matches (DISTINCT guards phrases that repeat a term). No
    * self-join per phrase length: any arity rides the same two-op
    * plan. Returns (phrase_id, doc_id, n_hits) for matching docs.
    */
  def phraseHits(docs: DataFrame,
      panel: Seq[(Long, Int, String, Int)]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val q = broadcast(panel.toDF("phrase_id", "pip", "term", "plen"))
    val posts = docs
      .select(col("doc_id"), posexplode(tokens(lower(col("text"))))
        .as(Seq("pos", "term")))
    posts.join(q, "term")
      .groupBy(col("phrase_id"), col("doc_id"),
        (col("pos") - col("pip")).as("start"), col("plen"))
      .agg(countDistinct("pip").as("nseen"))
      .filter(col("nseen") === col("plen"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .orderBy("phrase_id", "doc_id")
  }

  /** Distinct-n corpus diversity per source: the fraction of unique
    * 1/2/3-grams among all gram positions — the standard repetition/
    * diversity profile (distinct-n of generation eval, the corpus-level
    * twin of q_repetition's per-doc Gopher signals). ONE tokenize pass
    * explodes each position carrying its unigram, bigram, and trigram
    * (tail positions carry nulls, which count-distinct and the
    * position totals both ignore by construction); per-source
    * count/count-distinct pairs ride a single aggregate.
    */
  def distinctNgrams(docs: DataFrame): DataFrame = {
    val toksF = docs
      .select(col("source"), tokens(lower(col("text"))).as("__t"))
    val n = size(col("__t"))
    val grams = transform(sequence(lit(1), n), i => struct(
      element_at(col("__t"), i).as("w"),
      when(i + 1 <= n, concat_ws(" ",
        element_at(col("__t"), i), element_at(col("__t"), i + 1))).as("bg"),
      when(i + 2 <= n, concat_ws(" ",
        element_at(col("__t"), i), element_at(col("__t"), i + 1),
        element_at(col("__t"), i + 2))).as("tg")))
    explodeOnce(toksF, Seq(col("source")), grams, "__g")
      .select(col("source"), col("__g.w").as("w"), col("__g.bg").as("bg"),
        col("__g.tg").as("tg"))
      .groupBy("source")
      .agg(count("w").as("n1"), countDistinct("w").as("d1"),
        round(countDistinct("w") * lit(1.0) / count("w"), 4).as("r1"),
        round(countDistinct("bg") * lit(1.0) / count("bg"), 4).as("r2"),
        round(countDistinct("tg") * lit(1.0) / count("tg"), 4).as("r3"))
      .orderBy("source")
  }

  def defs: Map[String, QueryDef] = Map(
    // Per-source distinct-1/2/3-gram diversity ratios. The oracle
    // replays the position explode (null tails excluded from both
    // numerator and denominator) and every ratio.
    "q_distinct_ngrams" -> QueryDef(
      (s, dir) => distinctNgrams(spreadScan(table(s, dir, "documents"))),
      """WITH toks AS (
        |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT source, t, unnest(generate_series(1, len(t))) AS i
        |  FROM toks),
        |g AS (
        |  SELECT source, t[i] AS w,
        |    CASE WHEN i + 1 <= len(t) THEN t[i] || ' ' || t[i+1] END AS bg,
        |    CASE WHEN i + 2 <= len(t)
        |      THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS tg
        |  FROM pos)
        |SELECT source, count(w) AS n1, count(DISTINCT w) AS d1,
        |  round(count(DISTINCT w) * 1.0 / count(w), 4) AS r1,
        |  round(count(DISTINCT bg) * 1.0 / count(bg), 4) AS r2,
        |  round(count(DISTINCT tg) * 1.0 / count(tg), 4) AS r3
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin),

    // Top-30 adjacent-pair collocations by PMI (min pair count 5).
    // The oracle replays bigram counting, both marginals, the
    // quantized ln, the (s6, w1, w2) rank and the cut — a drift in
    // any count or the smoothing-free arithmetic hash-mismatches.
    "q_pmi_pairs" -> QueryDef(
      (s, dir) => pmiPairs(spreadScan(table(s, dir, "documents")),
        minCount = 5L, k = 30),
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |  FROM toks WHERE len(t) >= 2),
        |bg AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM pos),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM c12 GROUP BY 1),
        |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bg FROM c12),
        |sc AS (
        |  SELECT w1, w2, c12,
        |    CAST(round(1000000 * ln(
        |      (CAST(c12 AS DOUBLE) * CAST(n_bg AS DOUBLE)) /
        |      (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))) AS BIGINT) AS s6
        |  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
        |  WHERE c12 >= 5),
        |top AS (SELECT * FROM sc ORDER BY s6 DESC, w1, w2 LIMIT 30)
        |SELECT w1, w2, c12, round(s6 / 1000000.0, 4) AS pmi
        |FROM top ORDER BY w1, w2""".stripMargin),

    // Positional phrase hits for the fixed 3-phrase panel ("hash
    // join", "table scan", "sort merge batch"). The oracle replays
    // postings, the start-aligned distinct-position count, and the
    // exact-arity gate; a bag-of-words false positive (both terms
    // present, never adjacent) would hash-mismatch.
    "q_phrase_hits" -> QueryDef(
      (s, dir) => phraseHits(spreadScan(table(s, dir, "documents")),
        phrasePanel),
      """WITH q(phrase_id, pip, term, plen) AS (VALUES
        |  (0, 0, 'hash', 2), (0, 1, 'join', 2),
        |  (1, 0, 'table', 2), (1, 1, 'scan', 2),
        |  (2, 0, 'sort', 3), (2, 1, 'merge', 3), (2, 2, 'batch', 3)),
        |toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |posts AS (
        |  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t
        |  FROM toks),
        |p2 AS (SELECT doc_id, pos, t[pos] AS term FROM posts),
        |m AS (
        |  SELECT phrase_id, doc_id, pos - pip AS start, plen,
        |    count(DISTINCT pip) AS nseen
        |  FROM p2 JOIN q USING (term)
        |  GROUP BY 1, 2, 3, 4),
        |hits AS (SELECT phrase_id, doc_id FROM m WHERE nseen = plen)
        |SELECT CAST(phrase_id AS BIGINT) AS phrase_id, doc_id,
        |  count(*) AS n_hits
        |FROM hits GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
}
