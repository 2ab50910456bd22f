package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.functions.FloatDotProduct.fdot
import graft.operators.TextAnalysis.tokens
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-hygiene operators for a training-data pipeline: PII
  * scrubbing, repetition-based quality filters (the Gopher/C4 rules),
  * and benchmark decontamination. All three are standard pre-training
  * stages a user of a large-scale data engine expects as first-class
  * operators.
  *
  * Scale design: scrubbing and repetition metrics are pure column
  * expressions / per-doc aggregates (embarrassingly parallel, narrow
  * shuffles keyed by doc); decontamination joins the corpus's exploded
  * n-grams against a BROADCAST benchmark-gram set — the benchmark side
  * is eval-suite-sized by construction, so the corpus never shuffles.
  */
object Hygiene {

  // ---------- PII scrubbing -------------------------------------------

  /** Redaction patterns, ordered: URLs first (an email or IP inside a
    * URL must redact as part of the URL), then emails, then phone
    * numbers (the international `+CC …` shape, matched before cards so
    * a phone's digit groups can't be half-eaten by the card pattern),
    * then 16-digit card numbers in 4-4-4-4 groups, then IPv4s (last:
    * dot-separated, so no earlier pattern overlaps it).
    * The patterns are deliberately backtracking-free so Java regex
    * (Spark) and RE2 (DuckDB, external engines) agree exactly — no
    * backreferences, no lookaround.
    */
  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2}[ .-]?\\(?\\d{2,3}\\)?[ .-]?\\d{3,4}[ .-]?\\d{4}\\b"
  val CardRe = "\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Scrub a text column: URLs → <URL>, emails → <EMAIL>,
    * phones → <PHONE>, cards → <CARD>, IPv4s → <IP>, applied in that
    * order.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, UrlRe, "<URL>"),
            EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        CardRe, "<CARD>"),
      Ipv4Re, "<IP>")

  // ---------- repetition metrics (Gopher/C4 quality rules) ------------

  /** Per-document repetition metrics from one unigram and one bigram
    * explode: duplicate-token fraction, most-frequent-unigram
    * fraction, most-frequent-bigram fraction. Two narrow groupBys
    * keyed by (doc, gram) then doc — map-side combine does most of
    * the work, so the plan is the same at 500 docs or 5 B.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = spreadScan(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
    val uni = graft.functions.Functions.explodeOnce(
        base, Seq(col(idCol)), col("__toks"), "g")
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max("c").as("__top1"), sum("c").as("n_tokens"),
        count(lit(1)).as("__n_distinct"))
    val bi = graft.functions.Functions.explodeOnce(
        base, Seq(col(idCol)),
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1), i =>
            concat_ws(" ", element_at(col("__toks"), i),
              element_at(col("__toks"), i + lit(1)))))
          .otherwise(array().cast(ArrayType(StringType))), "g")
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max("c").as("__top2"), sum("c").as("__n_bigrams"))
    uni.join(bi, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        round(lit(1.0) - col("__n_distinct").cast(DoubleType) /
          greatest(col("n_tokens"), lit(1L)), 4).as("dup_token_frac"),
        round(col("__top1").cast(DoubleType) /
          greatest(col("n_tokens"), lit(1L)), 4).as("top_unigram_frac"),
        round(coalesce(col("__top2").cast(DoubleType) /
          greatest(col("__n_bigrams"), lit(1L)), lit(0.0)), 4)
          .as("top_bigram_frac"))
  }

  // ---------- benchmark decontamination --------------------------------

  /** Flag corpus documents sharing word n-grams with a benchmark/eval
    * set: explode the corpus's distinct n-gram shingles, inner-join the
    * broadcast distinct benchmark-gram set, count hits per doc. Real
    * pipelines dial n to 8-13 (q_decontaminate_n8 exercises that size);
    * the default 3 shares the near-dup family's shingler.
    *
    * The shingle frame feeds three branches (benchmark-gram build,
    * hits join, n_grams projection), so it is persisted — without it
    * the tokenize+n-gram stage, the expensive part, runs once per
    * branch (the round-3 16.9 s plan). Same pattern as
    * minhashNearDups. n_grams rides the explode through the hits
    * aggregation (max is exact: the value is constant per doc), so
    * only TWO branches read the cache and the final join keys on the
    * already-aggregated hits frame.
    *
    * Returns (id, n_overlap, n_grams, contam_frac) for every corpus
    * doc with at least one overlapping gram.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchPred: Column, n: Int = 3): DataFrame = {
    val sh = graft.InternalCaches.track(Dedup.shingled(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bench = sh.filter(benchPred)
      .select(explode(col("sh")).as("g")).distinct()
    val corpus = sh.filter(!benchPred)
    corpus.select(col(idCol), size(col("sh")).as("n_grams"),
        explode(col("sh")).as("g"))
      .join(broadcast(bench), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"), max(col("n_grams")).as("n_grams"))
      .select(col(idCol), col("n_overlap"), col("n_grams"),
        round(col("n_overlap").cast(DoubleType) /
          greatest(col("n_grams"), lit(1)), 4).as("contam_frac"))
  }

  /** EMBEDDING-space decontamination — the paraphrase-robust sibling
    * of `decontaminate`: a benchmark item that was reworded, translated
    * or re-templated shares no n-grams and few winnow fingerprints with
    * its corpus twin, but its embedding still sits within a cosine ball
    * of it. Flag every train vector whose cosine against ANY eval
    * vector clears `tau`, reporting the closest eval item (tie → the
    * smaller eval_id) and how many eval items it hits — the audit
    * table a contamination review reads before deciding what to drop.
    *
    * Scale shape: the eval side is eval-suite-sized by construction
    * (10³–10⁴ rows even when the corpus is 100 TB), so it BROADCASTS
    * and the corpus side is one map-only scoring pass — the `tau`
    * filter runs map-side, so only the contaminated sliver (churn-
    * sized) ever shuffles into the per-doc argmax. Exact by
    * construction; when the eval suite outgrows broadcast, the IVF
    * list-join (`probeAssigned`) is the drop-in approximate path.
    */
  def decontaminateSemantic(emb: DataFrame, evalPred: Column,
      tau: Double): DataFrame = {
    val e = spreadScan(emb).select(col("vec_id"), col("embedding"),
      evalPred.as("__ev"))
    val ev = e.filter(col("__ev"))
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev_v"))
    val cos = fdot(col("embedding"), col("ev_v")) /
      (sqrt(fdot(col("embedding"), col("embedding"))) *
        sqrt(fdot(col("ev_v"), col("ev_v"))))
    e.filter(!col("__ev")).select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(ev))
      .withColumn("cos_raw", cos)
      .filter(col("cos_raw") >= lit(tau))
      .groupBy("vec_id")
      // argmax on the RAW double; ties break to the SMALLER eval_id
      // (larger negated id wins the struct max)
      .agg(max(struct(col("cos_raw"),
          (lit(0L) - col("eval_id")).as("neg"))).as("m"),
        count(lit(1)).as("n_eval_hits"))
      .select(col("vec_id"), (lit(0L) - col("m.neg")).as("eval_id"),
        round(col("m.cos_raw"), 4).as("cos"), col("n_eval_hits"))
  }

  /** The streaming-gate form of [[decontaminateSemantic]]: given a
    * micro-batch of `(vec_id, embedding)` rows and the frozen eval
    * panel, return only the rows NO eval vector matches at `tau` — the
    * admission filter a vector-ingest stream runs so contaminated
    * vectors never reach the index. Same plan shape (broadcast panel,
    * map-side threshold) as the batch audit; the anti-join keeps
    * clean rows, so a row with a null/empty embedding passes (nothing
    * can prove it contaminated) — the null-row convention every gate
    * here follows.
    */
  def semanticGate(batch: DataFrame, evalVecs: DataFrame,
      tau: Double): DataFrame = {
    val ev = broadcast(spreadScan(evalVecs)
      .select(col("vec_id").as("__e_id"), col("embedding").as("__e_v")))
    val cos = fdot(col("embedding"), col("__e_v")) /
      (sqrt(fdot(col("embedding"), col("embedding"))) *
        sqrt(fdot(col("__e_v"), col("__e_v"))))
    val dirty = batch.select(col("vec_id"), col("embedding"))
      .crossJoin(ev)
      .filter(cos >= lit(tau))
      .select(col("vec_id")).distinct()
    batch.join(broadcast(dirty), Seq("vec_id"), "left_anti")
  }

  /** Winnow-fingerprint decontamination — the edit-robust sibling of
    * `decontaminate`: a benchmark doc that differs from a corpus doc
    * by whitespace or a few token edits shares most winnowing
    * fingerprints (position-independent window minima) even when
    * exact n-grams no longer match. Same scale shape: the benchmark
    * fingerprint set is eval-suite-sized → broadcast; the corpus's
    * exploded fingerprints never shuffle. Docs under 8 tokens carry no
    * fingerprints and are out of scope (the winnowing floor).
    *
    * Returns (id, n_shared, n_fps, fp_frac) for corpus docs sharing
    * ≥ `minShared` fingerprints with any benchmark doc.
    */
  def decontaminateByFingerprint(docs: DataFrame, idCol: String,
      textCol: String, benchPred: Column, minShared: Int = 2): DataFrame = {
    val fps = graft.InternalCaches.track(
      winnowFingerprints(docs, idCol, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bench = fps.filter(benchPred)
      .select(explode(col("fps")).as("fp")).distinct()
    fingerprintHits(fps.filter(!benchPred), idCol, bench)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol), col("n_shared"), col("n_fps"),
        round(col("n_shared").cast(DoubleType) /
          greatest(col("n_fps"), lit(1)), 4).as("fp_frac"))
  }

  /** (id, fps) winnow-fingerprint projection of a document frame —
    * the shared front half of fingerprint decontamination. Docs under
    * 8 tokens carry no fingerprints (the winnowing floor) and are
    * filtered here.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    spreadScan(docs)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 8)
      .select(col(idCol),
        transform(col("__toks"), t => TextAnalysis.hash32(t)).as("__h"))
      .select(col(idCol), TextAnalysis.gramHashes(col("__h")).as("__g"))
      .repartition(par)
      .select(col(idCol), TextAnalysis.winnow(col("__g")).as("fps"))
  }

  /** Per-doc shared-fingerprint counts of a (id, fps) frame against a
    * broadcast benchmark fingerprint column: (id, n_shared, n_fps).
    */
  def fingerprintHits(corpusFps: DataFrame, idCol: String,
      benchFps: DataFrame): DataFrame =
    graft.functions.Functions.explodeOnce(
        corpusFps.withColumn("__n_fps", size(col("fps"))),
        Seq(col(idCol), col("__n_fps")), col("fps"), "fp")
      .join(broadcast(benchFps.select("fp")), "fp")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"), max(col("__n_fps")).as("n_fps"))

  /** DuckDB replay of `decontaminate` at word-n-gram size `n` with a
    * `doc_id % modK = 0` benchmark slice — generated so the n=3 and
    * n=8 oracles stay in lockstep with the Spark operator.
    */
  private def decontamSql(n: Int, modK: Int): String = {
    val gram = (0 until n)
      .map(j => if (j == 0) "t[i]" else s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(t) - ${n - 1}), i -> $gram)) AS g
      |  FROM toks),
      |bench AS (SELECT DISTINCT unnest(g) AS gr FROM sh WHERE doc_id % $modK = 0),
      |corpus AS (SELECT * FROM sh WHERE doc_id % $modK <> 0),
      |hits AS (
      |  SELECT doc_id, count(*) AS n_overlap
      |  FROM (SELECT doc_id, unnest(g) AS gr FROM corpus) cg
      |  JOIN bench USING (gr) GROUP BY 1)
      |SELECT doc_id, n_overlap, len(g) AS n_grams,
      |  round(n_overlap * 1.0 / greatest(len(g), 1), 4) AS contam_frac
      |FROM corpus JOIN hits USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  // ---------- line-level cleaning (C4 / RefinedWeb line rules) ---------

  /** Deterministic 12-token line synthesis: the harness corpus is
    * single-line by construction, so the line-level operators and
    * their oracles both derive lines from the SAME pure function of
    * the text (same pattern as the planted PII suffixes and the
    * `doc_id % k` benchmark slices) — the oracle then checks the rule
    * engine, not the synthesis. A real multi-line corpus passes
    * `split(col("text"), "\n")` instead.
    */
  def synthLines(text: Column, lineLen: Int = 12): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0),
        ceil(size(toks).cast(DoubleType) / lineLen).cast(IntegerType) - 1),
      i => array_join(slice(toks, i * lineLen + 1, lit(lineLen)), " "))
  }

  /** C4-style intra-document line filtering (Raffel et al. 2020 §2.2,
    * the RefinedWeb per-line rules): a line survives iff it has at
    * least `minWords` words, contains no blacklisted word
    * (case-insensitive whole-word match), and — when
    * `requireTerminal` — ends in terminal punctuation. Emits per doc
    * the line counts, kept fraction, and the md5 of the cleaned text
    * so a rule that mis-fires on ANY line hash-mismatches.
    *
    * Scale: pure higher-order column expressions (`filter` over the
    * line array) — zero shuffles, whole-stage codegen end to end,
    * embarrassingly parallel at any corpus size.
    */
  def cleanLines(docs: DataFrame, idCol: String, lines: Column,
      minWords: Int, blacklist: Seq[String],
      requireTerminal: Boolean = false): DataFrame = {
    val keep: Column => Column = l => {
      val enough = size(split(trim(l), "\\s+")) >= minWords
      // Blacklist words are matched literally: each is regex-quoted
      // before joining the alternation, so entries carrying
      // metacharacters ("c++", "a.b") neither corrupt the pattern nor
      // throw at compile. An oracle replaying this rule in SQL must
      // escape the same way (the registry's lists are metachar-free
      // literals, so its DuckDB patterns stay plain).
      val black =
        if (blacklist.isEmpty) lit(false)
        else lower(l).rlike(
          s"(^|\\s)(${blacklist
            .map(w => java.util.regex.Pattern.quote(w.toLowerCase))
            .mkString("|")})(\\s|$$)")
      val terminal =
        if (requireTerminal) l.rlike("[.!?][\"')\\]]?\\s*$") else lit(true)
      enough && !black && terminal
    }
    spreadScan(docs)
      .select(col(idCol), lines.as("__lines"))
      .select(col(idCol), size(col("__lines")).as("n_lines"),
        filter(col("__lines"), keep).as("__kept"))
      .select(col(idCol), col("n_lines"),
        size(col("__kept")).as("n_kept"),
        round(size(col("__kept")).cast(DoubleType) /
          greatest(col("n_lines"), lit(1)), 4).as("kept_frac"),
        md5(array_join(col("__kept"), "\n")).as("clean_fp"))
  }

  /** RefinedWeb-style cross-corpus exact line deduplication (Penedo
    * et al. 2023 §3.3): any line occurring in more than `maxDocs`
    * distinct documents is dropped from EVERY document (boilerplate —
    * nav bars, footers, license blurbs — is exactly the text that
    * repeats across pages). Emits per doc the kept/dropped counts and
    * the md5 of the surviving text in original line order.
    *
    * Scale: one posexplode, one (doc, line)-distinct + line-keyed
    * count (both map-side combinable), one shuffle anti-join on the
    * line key, and a per-doc collect bounded by document length —
    * never all-pairs, never a driver collect. The exploded frame
    * feeds three branches (common-line build, anti-join, per-doc
    * counts) so it persists once.
    */
  def dedupLinesAcross(docs: DataFrame, idCol: String, lines: Column,
      maxDocs: Int = 1): DataFrame = {
    val posed = graft.InternalCaches.track(
      spreadScan(docs)
        .select(col(idCol), lines.as("__lines"))
        .select(col(idCol), size(col("__lines")).as("n_lines"),
          posexplode(col("__lines")).as(Seq("pos", "line")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val common = posed.select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select("line")
    val keptAgg = posed.join(common, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n")).as("clean_fp"))
    posed.select(col(idCol), col("n_lines")).distinct()
      .join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("__n_kept"), lit(0L)).cast(IntegerType).as("n_kept"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L)))
          .cast(IntegerType).as("n_dropped"),
        coalesce(col("clean_fp"), md5(lit(""))).as("clean_fp"))
  }

  /** The toks+lines CTE both line-level oracles share — the DuckDB
    * replay of [[synthLines]] at lineLen 12.
    */
  private val SynthLinesSql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id, list_transform(
      |    generate_series(0, CAST(ceil(len(t) / 12.0) AS INT) - 1),
      |    i -> array_to_string(t[i*12+1 : i*12+12], ' ')) AS ls
      |  FROM toks)""".stripMargin

  // ---------- declared queries ------------------------------------------

  def defs: Map[String, QueryDef] = Map(

    // PII scrub: the corpus carries no PII by construction, so the
    // query plants a deterministic doc_id-derived URL/email/phone/
    // card/IP suffix on every document — both engines build the
    // identical augmented text, so the oracle checks the scrub itself
    // (counts AND the md5 of the scrubbed text), not just
    // plausibility.
    "q_pii_scrub" -> QueryDef(
      (s, dir) => {
        val d4 = lpad(pmod(col("doc_id"), lit(10000)).cast(StringType), 4, "0")
        val aug = concat(col("text"),
          lit(" contact user"), col("doc_id").cast(StringType),
          lit("@example.com via http://site"), col("doc_id").cast(StringType),
          lit(".example.org/p call +1 555-123-"), d4,
          lit(" pay 4111 1111 "), d4,
          lit(" 1111 or 10.1."),
          pmod(col("doc_id"), lit(256)).cast(StringType), lit(".7"))
        spreadScan(table(s, dir, "documents"))
          .select(col("doc_id"), aug.as("__aug"))
          .select(col("doc_id"),
            regexp_count(col("__aug"), lit(UrlRe)).cast(LongType).as("n_urls"),
            regexp_count(col("__aug"), lit(EmailRe)).cast(LongType).as("n_emails"),
            regexp_count(col("__aug"), lit(PhoneRe)).cast(LongType).as("n_phones"),
            regexp_count(col("__aug"), lit(CardRe)).cast(LongType).as("n_cards"),
            regexp_count(col("__aug"), lit(Ipv4Re)).cast(LongType).as("n_ips"),
            md5(scrubPii(col("__aug"))).as("scrub_fp"))
          .orderBy("doc_id")
      },
      s"""WITH aug AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com via http://site' || CAST(doc_id AS VARCHAR)
        |    || '.example.org/p call +1 555-123-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' pay 4111 1111 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' 1111 or 10.1.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.7' AS a
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a, '$UrlRe')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(a, '$EmailRe')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(a, '$PhoneRe')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(a, '$CardRe')) AS BIGINT) AS n_cards,
        |  CAST(len(regexp_extract_all(a, '$Ipv4Re')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(a,
        |    '$UrlRe', '<URL>', 'g'),
        |    '$EmailRe', '<EMAIL>', 'g'),
        |    '$PhoneRe', '<PHONE>', 'g'),
        |    '$CardRe', '<CARD>', 'g'),
        |    '$Ipv4Re', '<IP>', 'g')) AS scrub_fp
        |FROM aug ORDER BY doc_id""".stripMargin),

    // Repetition quality metrics (Gopher rules): duplicate-token
    // fraction, top-unigram fraction, top-bigram fraction.
    "q_repetition" -> QueryDef(
      (s, dir) => repetitionMetrics(
        table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |uc AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2),
        |us AS (
        |  SELECT doc_id, max(c) AS top1, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct
        |  FROM uc GROUP BY 1),
        |bc AS (
        |  SELECT doc_id, g, count(*) AS c
        |  FROM (SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS g
        |    FROM toks) GROUP BY 1, 2),
        |bs AS (SELECT doc_id, max(c) AS top2, sum(c) AS n_bigrams FROM bc GROUP BY 1)
        |SELECT us.doc_id, n_tokens,
        |  round(1.0 - n_distinct * 1.0 / greatest(n_tokens, 1), 4) AS dup_token_frac,
        |  round(top1 * 1.0 / greatest(n_tokens, 1), 4) AS top_unigram_frac,
        |  round(coalesce(top2 * 1.0 / greatest(n_bigrams, 1), 0.0), 4) AS top_bigram_frac
        |FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
        |ORDER BY us.doc_id""".stripMargin),

    // Decontamination vs a deterministic benchmark slice
    // (doc_id % 97 = 0 stands in for the eval suite): corpus docs
    // sharing ≥ 1 word-3-gram with any benchmark doc, with overlap
    // counts — the exact surface a contamination audit reports.
    "q_decontaminate" -> QueryDef(
      (s, dir) => decontaminate(
        table(s, dir, "documents"), "doc_id", "text",
        pmod(col("doc_id"), lit(97)) === 0)
        .orderBy("doc_id"),
      decontamSql(3, 97)),

    // Fingerprint decontamination vs a doc_id % 59 benchmark slice:
    // hit docs are the planted near-dups of benchmark docs — the case
    // where exact n-grams already drift but window minima survive.
    // The oracle replays the whole winnowing chain (md5 token hashes,
    // mod-2^31-ish rolling grams, window minima) plus the hit count.
    "q_decontaminate_fp" -> QueryDef(
      (s, dir) => decontaminateByFingerprint(
        table(s, dir, "documents"), "doc_id", "text",
        pmod(col("doc_id"), lit(59)) === 0)
        .orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    t -> CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS UINT32) AS BIGINT)) AS h
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(h) - 3),
        |    i -> ((((h[i] * 131 + h[i+1]) % 2147483647) * 131 + h[i+2])
        |          % 2147483647 * 131 + h[i+3]) % 2147483647) AS g
        |  FROM toks),
        |winnowed AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(
        |    generate_series(1, len(g) - 4), i -> list_min(g[i:i+4])))) AS fps
        |  FROM grams WHERE len(g) >= 5),
        |bench AS (SELECT DISTINCT unnest(fps) AS fp FROM winnowed
        |  WHERE doc_id % 59 = 0),
        |corp AS (SELECT * FROM winnowed WHERE doc_id % 59 <> 0),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_shared
        |  FROM (SELECT doc_id, unnest(fps) AS fp FROM corp) cf
        |  JOIN bench USING (fp) GROUP BY 1)
        |SELECT doc_id, n_shared, CAST(len(fps) AS INT) AS n_fps,
        |  round(n_shared * 1.0 / greatest(len(fps), 1), 4) AS fp_frac
        |FROM corp JOIN hits USING (doc_id)
        |WHERE n_shared >= 2
        |ORDER BY doc_id""".stripMargin),

    // Decontamination at the production n-gram size (8 words — the
    // 8-13 range real contamination audits use). Overlap at n=8 only
    // survives between planted near-duplicates, so the benchmark slice
    // is denser (doc_id % 11) to keep the result non-trivial.
    "q_decontaminate_n8" -> QueryDef(
      (s, dir) => decontaminate(
        table(s, dir, "documents"), "doc_id", "text",
        pmod(col("doc_id"), lit(11)) === 0, n = 8)
        .orderBy("doc_id"),
      decontamSql(8, 11)),

    // Embedding-space decontamination vs a FROZEN eval suite (the
    // vec_id % 13 slice bounded to the un-replicated id range — an
    // eval registry does not grow with the crawl, so the harness's
    // scale replicas land on the TRAIN side where their cos-1.0 eval
    // twins are exactly the contamination the op exists to catch) at
    // cosine ≥ 0.3 — the paraphrase-robust third member of the
    // decontamination family (n-grams catch copies, fingerprints catch
    // edits, embeddings catch rewordings). The oracle replays every
    // cosine, the threshold, the per-doc argmax and the hit count.
    "q_decontaminate_semantic" -> QueryDef(
      (s, dir) => decontaminateSemantic(
        table(s, dir, "embeddings"),
        pmod(col("vec_id"), lit(13)) === 5 && col("vec_id") < 100000L,
        tau = 0.3)
        .orderBy("vec_id"),
      """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, v AS ev_v FROM u
        |  WHERE vec_id % 13 = 5 AND vec_id < 100000),
        |tr AS (SELECT vec_id, v FROM u
        |  WHERE NOT (vec_id % 13 = 5 AND vec_id < 100000)),
        |sims AS (
        |  SELECT tr.vec_id, ev.eval_id,
        |    list_dot_product(tr.v, ev.ev_v) /
        |      (sqrt(list_dot_product(tr.v, tr.v)) *
        |       sqrt(list_dot_product(ev.ev_v, ev.ev_v))) AS cos_raw
        |  FROM tr CROSS JOIN ev),
        |hits AS (SELECT * FROM sims WHERE cos_raw >= 0.3)
        |SELECT vec_id, eval_id, round(cos_raw, 4) AS cos,
        |  CAST(count(*) OVER (PARTITION BY vec_id) AS BIGINT) AS n_eval_hits
        |FROM hits
        |QUALIFY row_number() OVER (PARTITION BY vec_id
        |  ORDER BY cos_raw DESC, eval_id) = 1
        |ORDER BY vec_id""".stripMargin),

    // C4-style line filtering over synthesized 12-token lines:
    // minWords=9 drops the short tail line most docs carry, and the
    // blacklist word "dup" (the planted near-dup marker, 26 corpus
    // occurrences) exercises the whole-word blacklist rule on real
    // rows. The terminal-punctuation rule is spec-covered (the corpus
    // carries no punctuation by construction).
    "q_c4_lines" -> QueryDef(
      (s, dir) => cleanLines(table(s, dir, "documents"), "doc_id",
        synthLines(col("text")), minWords = 9, blacklist = Seq("dup"))
        .orderBy("doc_id"),
      s"""$SynthLinesSql,
        |kept AS (
        |  SELECT doc_id, len(ls) AS n_lines,
        |    list_filter(ls, l ->
        |      len(regexp_split_to_array(trim(l), '\\s+')) >= 9
        |      AND NOT regexp_matches(lower(l), '(^|\\s)(dup)(\\s|$$)')) AS ks
        |  FROM lines)
        |SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
        |  CAST(len(ks) AS INT) AS n_kept,
        |  round(len(ks) * 1.0 / greatest(n_lines, 1), 4) AS kept_frac,
        |  md5(coalesce(array_to_string(ks, chr(10)), '')) AS clean_fp
        |FROM kept ORDER BY doc_id""".stripMargin),

    // Cross-corpus exact line dedup: at sf0.01 the synthesized corpus
    // carries ~96 lines shared across ≥2 docs (the planted near-dup
    // families align on 12-token boundaries), so the anti-join does
    // real work; every doc is emitted, dropped-to-zero docs pin the
    // md5('') branch.
    "q_line_dedup" -> QueryDef(
      (s, dir) => dedupLinesAcross(table(s, dir, "documents"), "doc_id",
        synthLines(col("text"))).orderBy("doc_id"),
      s"""$SynthLinesSql,
        |posed AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ls))) AS pos, ls
        |  FROM lines),
        |posed2 AS (SELECT doc_id, pos, ls[pos] AS line FROM posed),
        |common AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS c FROM posed2 GROUP BY 1)
        |  WHERE c > 1),
        |kept AS (SELECT doc_id, pos, line FROM posed2 ANTI JOIN common USING (line)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_fp
        |  FROM kept GROUP BY 1),
        |base AS (SELECT doc_id, len(ls) AS n_lines FROM lines)
        |SELECT b.doc_id, CAST(n_lines AS INT) AS n_lines,
        |  CAST(coalesce(n_kept, 0) AS INT) AS n_kept,
        |  CAST(n_lines - coalesce(n_kept, 0) AS INT) AS n_dropped,
        |  coalesce(clean_fp, md5('')) AS clean_fp
        |FROM base b LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)
  )
}
