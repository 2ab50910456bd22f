package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Web-corpus URL curation: canonicalization, URL-level deduplication,
  * and the per-domain composition table. In a CommonCrawl-shaped
  * pipeline these run BEFORE any text operator — the same page is
  * fetched under `http://www.x.com/p/`, `https://x.com/p?utm_source=…`
  * and `HTTPS://X.COM:443/p`, and dropping those re-fetches by
  * canonical URL is far cheaper than letting MinHash discover the
  * resulting exact-duplicate text later (reference keeps per-source
  * keys unique the same way before joining,
  * `datasets/create_projectsync_dataset.ipynb` cell 9's key hygiene).
  *
  * Scale design: canonicalization is pure per-row string/regex column
  * math (codegen, zero shuffles). URL dedup adds ONE hash exchange on
  * the canonical key (window rank + group count share the same
  * partitioning). Domain stats is one map-side-combined aggregate
  * whose output is domain-count-sized. Nothing here is all-pairs and
  * nothing grows driver state, so the plan is the same at 500 docs or
  * 5 B pages.
  *
  * All regexes are backtracking-free and RE2-portable so Spark (Java
  * regex) and external engines (RE2) agree byte-for-byte.
  */
object WebCorpus {

  /** Query parameters that track campaigns, not content: drop them
    * before comparing URLs. Anchored on the parameter NAME (so
    * `id=utm_x` survives) and matching bare keys too (`?utm_campaign`
    * with no `=` is still tracking).
    */
  val TrackingParamRe = "^(utm_[^=&]*|fbclid|gclid)(=|$)"

  /** Canonicalize an absolute URL for identity comparison:
    *   1. strip the fragment (`#…` — client-side only);
    *   2. lowercase the scheme and host (RFC 3986 §6.2.2.1);
    *   3. drop a default port (`:443`/`:80`);
    *   4. drop a leading `www.`;
    *   5. strip trailing slashes from the path;
    *   6. drop tracking query params, sort the survivors, and omit
    *      `?` entirely when none survive.
    *
    * Pure column expression — decomposes the URL with anchored regex
    * extracts, never a UDF, so the whole step inlines into whole-stage
    * codegen next to whatever scan produced the column.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort =
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // a default port is default only for ITS scheme: http://x:443 is
    // a different origin from http://x and must survive
    val noPort = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(noPort, "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val keptParams = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val canonQuery = array_join(keptParams, "&")
    concat(scheme, lit("://"), host, path,
      when(canonQuery === "", lit(""))
        .otherwise(concat(lit("?"), canonQuery)))
  }

  /** The registrable domain of a CANONICAL url (host already
    * lowercased, de-`www.`ed, port-stripped by [[canonicalizeUrl]]).
    */
  def domainOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** URL-level dedup: every row keeps its raw and canonical URL, the
    * canonical-group size, and `kept` — true for the group's best row
    * (longest text wins, ties to the smallest id: the keep-best rule
    * q_dedup_keep_best applies to near-dup clusters, applied here to
    * exact URL identity). One exchange: rank and group count ride the
    * same canonical-key window partitioning.
    */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String,
      qualityCol: String): DataFrame = {
    val w = Window.partitionBy(col("canon_url"))
    spreadScan(docs)
      .select(col(idCol), col(qualityCol), col(urlCol).as("url"))
      .withColumn("canon_url", canonicalizeUrl(col("url")))
      .withColumn("n_dups", count(lit(1)).over(w).cast(IntegerType))
      .withColumn("kept",
        row_number().over(
          w.orderBy(col(qualityCol).desc, col(idCol))) === 1)
      .drop(qualityCol)
  }

  /** Per-domain composition: page count, distinct canonical URLs,
    * total chars, and the fetch-duplication factor — the table a
    * crawl scheduler and a mixture planner read per snapshot.
    */
  def domainStats(docs: DataFrame, idCol: String, urlCol: String,
      charsCol: String): DataFrame =
    spreadScan(docs)
      .select(col(idCol), col(charsCol),
        canonicalizeUrl(col(urlCol)).as("canon_url"))
      .select(col(idCol), col(charsCol), col("canon_url"),
        domainOf(col("canon_url")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        countDistinct(col("canon_url")).as("n_pages"),
        sum(col(charsCol)).cast(LongType).as("total_chars"))
      .withColumn("dup_factor",
        round(col("n_docs").cast(DoubleType) / col("n_pages"), 4))

  // ---------- markup extraction ------------------------------------------

  /** Script/style blocks drop WITH their content (code is not prose);
    * `(?s)` + non-greedy so a block never swallows past its own close
    * tag. Both Java regex (Spark) and RE2 (external engines) support
    * the flag and the lazy quantifier.
    */
  val ScriptBlockRe = "(?s)<(script|style)[^>]*>.*?</(script|style)>"

  /** HTML comments drop whole (their content is markup, not prose);
    * lazy so one comment never swallows to the next one's close.
    */
  val CommentRe = "(?s)<!--.*?-->"

  /** Any remaining tag — the HTML tag GRAMMAR, not "anything in
    * angle brackets": a tag starts `<letter`, `</letter` or `<!`
    * (doctype), so plain-text math like `a < b and c > d` survives
    * intact. Linear scan (the class excludes `>`).
    */
  val TagRe = "</?[A-Za-z][^>]*>|<![^>]*>"

  /** Markup-to-text extraction — the boilerplate-independent half of
    * what an HTML text extractor does, as pure column regex math:
    *   1. drop script/style blocks with their content;
    *   2. strip remaining tags (each becomes a space so adjacent
    *      words never fuse);
    *   3. unescape the five predefined XML entities (amp last, so
    *      `&amp;lt;` stays a literal `&lt;` — double-escaped text must
    *      not un-escape twice);
    *   4. collapse whitespace runs and trim.
    * A DOM parser handles malformed nesting better; at 100 TB the
    * regex path is the one that stays inside whole-stage codegen with
    * zero per-row allocation beyond the result, which is why C4's own
    * pipeline is regex/heuristic rather than DOM (Raffel et al. 2020
    * §2.2). Swap a real parser behind the same column seam when
    * fidelity beats throughput.
    */
  def stripMarkup(c: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(c, ScriptBlockRe, " "), CommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val unescaped = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  // ---------- deterministic URL synthesis --------------------------------

  /** The harness corpus carries no URL column, so the URL operators
    * synthesize one deterministically from `doc_id` — the q_c4_lines /
    * q_pii_scrub pattern: both engines build the IDENTICAL raw URL, so
    * the oracle checks canonicalization and dedup, not the synthesis.
    * 211 canonical pages across 13 hosts; `doc_id % 6` picks which
    * messy-but-equivalent form this fetch saw (canonical, cased,
    * www+trailing-slash, default-port+param-order, tracking+fragment,
    * tracking tail).
    */
  def synthUrl(docId: Column): Column = {
    val g = pmod(docId, lit(211)).cast(StringType)
    val h = pmod(pmod(docId, lit(211)), lit(13)).cast(StringType)
    val v = pmod(docId, lit(6))
    val path = concat(lit("/a/"), g)
    val id = concat(lit("id="), g)
    when(v === 0, concat(lit("https://ex"), h, lit(".org"), path,
        lit("?"), id, lit("&ref=home")))
      .when(v === 1, concat(lit("HTTPS://EX"), h, lit(".ORG"), path,
        lit("?"), id, lit("&ref=home")))
      .when(v === 2, concat(lit("https://www.ex"), h, lit(".org"), path,
        lit("/?"), id, lit("&ref=home")))
      .when(v === 3, concat(lit("https://ex"), h, lit(".org:443"), path,
        lit("?ref=home&"), id))
      .when(v === 4, concat(lit("https://ex"), h, lit(".org"), path,
        lit("?utm_source=tw&"), id, lit("&ref=home#frag")))
      .otherwise(concat(lit("https://ex"), h, lit(".org"), path,
        lit("?"), id, lit("&ref=home&utm_campaign=x")))
  }

  /** DuckDB replay of [[synthUrl]] + [[canonicalizeUrl]]: the CTE
    * prefix both URL oracles share (ends in a `canon` relation with
    * doc_id, n_chars, url, canon_url, domain).
    */
  private val CanonSql =
    """WITH syn AS (
      |  SELECT doc_id, n_chars,
      |    CAST(doc_id % 211 AS VARCHAR) AS g,
      |    CAST((doc_id % 211) % 13 AS VARCHAR) AS h,
      |    doc_id % 6 AS v
      |  FROM documents),
      |raw AS (
      |  SELECT doc_id, n_chars, CASE v
      |    WHEN 0 THEN 'https://ex' || h || '.org/a/' || g || '?id=' || g || '&ref=home'
      |    WHEN 1 THEN 'HTTPS://EX' || h || '.ORG/a/' || g || '?id=' || g || '&ref=home'
      |    WHEN 2 THEN 'https://www.ex' || h || '.org/a/' || g || '/?id=' || g || '&ref=home'
      |    WHEN 3 THEN 'https://ex' || h || '.org:443/a/' || g || '?ref=home&id=' || g
      |    WHEN 4 THEN 'https://ex' || h || '.org/a/' || g || '?utm_source=tw&id=' || g || '&ref=home#frag'
      |    ELSE 'https://ex' || h || '.org/a/' || g || '?id=' || g || '&ref=home&utm_campaign=x'
      |    END AS url
      |  FROM syn),
      |parts AS (
      |  SELECT doc_id, n_chars, url, scheme,
      |    regexp_replace(
      |      CASE WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '')
      |           WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '')
      |           ELSE hp END, '^www\.', '') AS host,
      |    regexp_replace(
      |      regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
      |      '/+$', '') AS path,
      |    array_to_string(list_sort(list_filter(string_split(
      |      regexp_extract(nf, '\?(.*)$', 1), '&'),
      |      p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[^=&]*|fbclid|gclid)(=|$)'))), '&') AS qs
      |  FROM (SELECT *,
      |      lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |      lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hp
      |    FROM (SELECT *, regexp_replace(url, '#.*$', '') AS nf FROM raw))),
      |canon AS (
      |  SELECT doc_id, n_chars, url,
      |    scheme || '://' || host || path ||
      |      CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url,
      |    host AS domain
      |  FROM parts)""".stripMargin

  // ---------- declared queries ------------------------------------------

  def defs: Map[String, QueryDef] = Map(

    // URL canonicalization + keep-best dedup over the synthesized
    // fetch log: 500 fetches collapse onto 211 canonical pages at
    // sf0.01, so every canonicalization rule fires on real rows and
    // the keep-best rank breaks real ties.
    "q_url_dedup" -> QueryDef(
      (s, dir) => urlDedup(
        table(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            synthUrl(col("doc_id")).as("__url")),
        "doc_id", "__url", "n_chars")
        .orderBy("doc_id"),
      s"""$CanonSql,
        |ranked AS (
        |  SELECT doc_id, url, canon_url,
        |    CAST(count(*) OVER (PARTITION BY canon_url) AS INT) AS n_dups,
        |    row_number() OVER (PARTITION BY canon_url
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM canon)
        |SELECT doc_id, url, canon_url, n_dups, rn = 1 AS kept
        |FROM ranked ORDER BY doc_id""".stripMargin),

    // Markup extraction over deterministically synthesized HTML: every
    // doc wraps in a head/title, a script block (content must DROP),
    // a nav div, and entity-escaped tail text — so block removal, tag
    // stripping, the strip-before-unescape ordering (the tail's
    // `&lt;end&gt;` must survive as literal `<end>` text, which it
    // only does if tags strip first) and whitespace collapse all
    // hash-check on every row. Map-only: the whole chain is chained
    // regexp_replace, zero shuffles.
    "q_html_extract" -> QueryDef(
      (s, dir) => {
        val idS = col("doc_id").cast(StringType)
        val html = concat(
          lit("<html><head><title>doc "), idS,
          lit("</title><script>var id="), idS,
          lit("; if (id &lt; 0) {}</script></head><body><div class=nav>"),
          lit("home | about | contact</div><p>"), col("text"),
          lit("</p><p>tail &amp; "), idS,
          lit(" &lt;end&gt;</p></body></html>"))
        spreadScan(table(s, dir, "documents"))
          .select(col("doc_id"), html.as("__h"))
          .select(col("doc_id"),
            regexp_replace(col("__h"), ScriptBlockRe, " ").as("__nb"))
          .select(col("doc_id"),
            regexp_count(col("__nb"), lit(TagRe)).cast(LongType)
              .as("n_tags"),
            stripMarkup(col("__nb")).as("__clean"))
          .select(col("doc_id"), col("n_tags"),
            length(col("__clean")).cast(LongType).as("clean_len"),
            md5(col("__clean")).as("clean_fp"))
          .orderBy("doc_id")
      },
      """WITH raw AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title><script>var id=' || CAST(doc_id AS VARCHAR)
        |    || '; if (id &lt; 0) {}</script></head><body><div class=nav>'
        |    || 'home | about | contact</div><p>' || text
        |    || '</p><p>tail &amp; ' || CAST(doc_id AS VARCHAR)
        |    || ' &lt;end&gt;</p></body></html>' AS h
        |  FROM documents),
        |nb AS (
        |  SELECT doc_id, regexp_replace(h,
        |    '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS s
        |  FROM raw),
        |clean AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(s, '</?[A-Za-z][^>]*>|<![^>]*>'))
        |      AS BIGINT) AS n_tags,
        |    trim(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        regexp_replace(regexp_replace(
        |          regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g'),
        |          '</?[A-Za-z][^>]*>|<![^>]*>', ' ', 'g'),
        |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |        '&#39;', CHR(39), 'g'), '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS c
        |  FROM nb)
        |SELECT doc_id, n_tags, CAST(length(c) AS BIGINT) AS clean_len,
        |  md5(c) AS clean_fp
        |FROM clean ORDER BY doc_id""".stripMargin),

    // Per-domain composition table: 13 rows at any corpus size — the
    // crawl-scheduler / mixture-planner view of the same canonical
    // space (dup_factor > 1 everywhere because every page is fetched
    // under several raw forms).
    "q_domain_stats" -> QueryDef(
      (s, dir) => domainStats(
        table(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            synthUrl(col("doc_id")).as("__url")),
        "doc_id", "__url", "n_chars")
        .orderBy("domain"),
      s"""$CanonSql
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT canon_url) AS BIGINT) AS n_pages,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(count(*) * 1.0 / count(DISTINCT canon_url), 4) AS dup_factor
        |FROM canon GROUP BY 1 ORDER BY domain""".stripMargin)
  )
}
