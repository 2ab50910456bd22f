package graft

import graft.operators.WebCorpus
import org.apache.spark.sql.functions._

class WebCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(WebCorpus.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: every messy-but-equivalent form collapses") {
    val expected = "https://ex1.org/a/14?id=14&ref=home"
    val got = canon(
      "https://ex1.org/a/14?id=14&ref=home",
      "HTTPS://EX1.ORG/a/14?id=14&ref=home",
      "https://www.ex1.org/a/14/?id=14&ref=home",
      "https://ex1.org:443/a/14?ref=home&id=14",
      "https://ex1.org/a/14?utm_source=tw&id=14&ref=home#frag",
      "https://ex1.org/a/14?id=14&ref=home&utm_campaign=x")
    assert(got.forall(_ == expected), got.mkString("\n"))
  }

  test("canonicalizeUrl: rules that must NOT fire") {
    // non-default port survives; path case survives; a param whose
    // VALUE mentions utm_ survives; scheme difference is identity
    assert(canon("https://ex.org:8443/P?x=utm_a") ==
      Seq("https://ex.org:8443/P?x=utm_a"))
    assert(canon("http://ex.org/p") != canon("https://ex.org/p"))
    // http default port :80 also strips; bare query '?' drops
    assert(canon("http://WWW.Ex.Org:80/p?") == Seq("http://ex.org/p"))
    // a default port is default only for ITS scheme: http://x:443 is
    // a real non-default origin and must survive (and vice versa)
    assert(canon("http://ex.org:443/p") == Seq("http://ex.org:443/p"))
    assert(canon("https://ex.org:80/p") == Seq("https://ex.org:80/p"))
    // all-tracking query drops the '?' entirely; fragment-only too;
    // a BARE tracking key (no '=') is still tracking
    assert(canon("https://ex.org/p?utm_source=a&gclid=z#top") ==
      Seq("https://ex.org/p"))
    assert(canon("https://ex.org/p?utm_campaign&id=1") ==
      Seq("https://ex.org/p?id=1"))
  }

  test("urlDedup: group size and keep-best rank with tie to min id") {
    val docs = Seq(
      (1L, 50L, "https://ex.org/p"),
      (2L, 90L, "https://WWW.ex.org/p/"),   // same canon, best quality
      (3L, 90L, "https://ex.org:443/p"),    // quality tie -> id 2 wins
      (4L, 10L, "https://ex.org/q")         // singleton group
    ).toDF("doc_id", "n_chars", "url")
    val out = WebCorpus.urlDedup(docs, "doc_id", "url", "n_chars")
      .select("doc_id", "canon_url", "n_dups", "kept")
      .as[(Long, String, Int, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._2).distinct.sorted.toSeq ==
      Seq("https://ex.org/p", "https://ex.org/q"))
    assert(out.map(r => r._1 -> r._3).toMap == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 1))
    assert(out.filter(_._4).map(_._1).toSeq == Seq(2L, 4L))
  }

  test("domainStats reconciles with the corpus and the canonical space") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        WebCorpus.synthUrl(col("doc_id")).as("url"))
    val stats = WebCorpus.domainStats(docs, "doc_id", "url", "n_chars")
      .collect()
    assert(stats.length == 13) // ex0..ex12
    assert(stats.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(stats.map(_.getAs[Long]("n_pages")).sum == 211)
    // every domain is fetched under several raw forms
    assert(stats.forall(_.getAs[Double]("dup_factor") > 1.0))
  }

  test("canonicalizeUrl is idempotent over the messy-component grid") {
    // canonical output must be a fixed point: re-canonicalizing a
    // stored canonical URL (the common pipeline mistake) changes
    // nothing. Grid covers every rule and their combinations.
    val urls = for {
      scheme <- Seq("https", "HTTPS", "http")
      host <- Seq("Ex.Org", "www.ex.org", "ex.org:443", "ex.org:8443")
      path <- Seq("/a", "/a/", "", "/a//")
      q <- Seq("", "?b=2&a=1", "?utm_source=x&id=1", "?utm_campaign", "?")
      frag <- Seq("", "#f")
    } yield s"$scheme://$host$path$q$frag"
    val once = urls.toDF("u")
      .select(WebCorpus.canonicalizeUrl(col("u")).as("c")).as[String].collect()
    val twice = once.toSeq.toDF("u")
      .select(WebCorpus.canonicalizeUrl(col("u")).as("c")).as[String].collect()
    assert(once.toSeq == twice.toSeq,
      once.zip(twice).filter(p => p._1 != p._2).take(3).mkString("\n"))
  }

  private def strip(s: String): String =
    Seq(s).toDF("h").select(WebCorpus.stripMarkup(col("h")).as("c"))
      .as[String].collect().head

  test("stripMarkup: blocks drop with content, tags strip, entities unescape once") {
    assert(strip("<p>a<br/>b</p>") == "a b")
    // script content (incl. a '<' inside) is code, not prose
    assert(strip("x<script>if (a &lt; b) {}</script>y") == "x y")
    assert(strip("<style type=css>p { color: red }</style>text") == "text")
    // two blocks: lazy quantifier must not swallow the text between
    assert(strip("<script>a</script>MID<script>b</script>") == "MID")
    // strip-before-unescape: &lt;end&gt; survives as literal <end>
    // text — unescaping first would expose it to the tag stripper
    assert(strip("<p>tail &amp; x &lt;end&gt;</p>") == "tail & x <end>")
    // double-escaped text unescapes exactly once (amp runs last)
    assert(strip("&amp;lt;") == "&lt;")
    assert(strip("a &quot;q&quot; &#39;s&#39;") == "a \"q\" 's'")
    // whitespace runs collapse; tag boundaries never fuse words
    assert(strip("<div>a</div><div>b</div>") == "a b")
    // the tag GRAMMAR, not "anything in angle brackets": plain-text
    // comparisons survive; comments and doctype drop whole
    assert(strip("if a < b and c > d then") == "if a < b and c > d then")
    assert(strip("x<!-- hidden <b>markup</b> -->y") == "x y")
    assert(strip("<!DOCTYPE html><p>t</p>") == "t")
  }

  test("q_url_dedup: exactly one kept row per canonical url; kept is argmax") {
    val out = SparkEntry.queries("q_url_dedup")(spark, sfDir)
    val perCanon = out.groupBy("canon_url")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("n_kept"),
        count(lit(1)).as("n"), first("n_dups").as("nd"))
      .collect()
    assert(perCanon.length == 211)
    assert(perCanon.forall(_.getAs[Long]("n_kept") == 1L))
    assert(perCanon.forall(r => r.getAs[Long]("n") == r.getAs[Int]("nd").toLong))
  }
}
