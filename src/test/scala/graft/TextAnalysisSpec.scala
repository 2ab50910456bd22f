package graft

import graft.operators.TextAnalysis._
import org.apache.spark.sql.functions._

/** Text-analysis kit: tokenization, normalization, fingerprints,
  * language-ID branch order, token estimates.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def oneText(t: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(t).toDF("t").select(c(col("t")).as("v")).head()

  test("tokens: trims edges, splits on whitespace runs") {
    assert(oneText("  a  b\tc ", tokens).getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("normalize + fingerprint: case/whitespace-insensitive exact-dup key") {
    val fp = Seq("Hello   World", "hello world", "different")
      .toDF("t").select(fingerprint(col("t")).as("v"))
      .collect().map(_.getString(0))
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
  }

  test("tokenEstimate: one unit per short token, ceil(len/6) for long") {
    // "hi there" → 1 + 1; "abcdefghijkl" (12 chars) → 2
    assert(oneText("hi there", tokenEstimate).getLong(0) == 2L)
    assert(oneText("abcdefghijkl", tokenEstimate).getLong(0) == 2L)
  }

  test("stopwordRatio: counted over the given set, 0 for empty text") {
    val r = Seq("the cat and the dog").toDF("t")
      .select(stopwordRatio(col("t"), Seq("the", "and")).as("v")).head().getDouble(0)
    assert(math.abs(r - 0.6) < 1e-9)
  }

  test("langId: charset beats function words; first match wins") {
    val cases = Seq(
      "привет мир" -> "ru",
      "der Hund und die Katze" -> "de", // function words (no umlaut)
      "schöne Grüße" -> "de",           // umlaut charset rule
      "el perro y los gatos" -> "es",
      "le chien est grand" -> "fr",
      "the dog is big" -> "en",
      "xyzzy plugh" -> "und")
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), langId(col("t")).as("lang")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (t, want) => assert(got(t) == want, t) }
  }

  test("winnow: shared text yields shared fingerprints; shifted text too") {
    def fps(text: String): Set[Long] = {
      Seq(text).toDF("t")
        .select(transform(tokens(col("t")), w => hash32(w)).as("h"))
        .select(gramHashes(col("h")).as("g"))
        .select(explode(winnow(col("g"))).as("fp"))
        .collect().map(_.getLong(0)).toSet
    }
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val shifted = "PREFIX " + base // same content, shifted one position
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert(fps(base).nonEmpty)
    // winnowing fingerprints are position-independent: a pure shift
    // preserves every window minimum
    assert(fps(base).subsetOf(fps(shifted)))
    assert(fps(base).intersect(fps(other)).isEmpty)
    // gram count below window width → no fingerprints
    val tiny = Seq("a b c d e").toDF("t")
      .select(gramHashes(transform(tokens(col("t")), w => hash32(w))).as("g"))
      .select(size(col("g")).as("n")).head().getInt(0)
    assert(tiny == 2) // 5 tokens → 2 grams < window 5
  }

  test("chunkDocs: exact windows, stride overlap, short tail, and the " +
      "empty-doc tokenizer contract") {
    val docs = Seq(
      (1L, "a b c d e f g"),   // 7 tokens: chunk 4 / stride 3 → 3 windows
      (2L, "x y"),             // fits one window
      (3L, "")                 // whitespace-only tokenizes to [""]
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .chunkDocs(docs, "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(d1.toSeq == Seq(
      (0, "a b c d", 4),
      (1, "d e f g", 4),       // overlap of 1 token with the previous
      (2, "g", 1)))            // short tail, not re-aligned
    val d2 = out.filter(_.getLong(0) == 2L)
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(d2.toSeq == Seq((0, "x y", 2)))
    // the whitespace tokenizer maps "" to [""], so an empty doc emits
    // exactly one empty chunk — the same contract the oracle replays
    val d3 = out.filter(_.getLong(0) == 3L)
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(d3.toSeq == Seq((0, "", 1)))
    // reconstruction: stride-aligned window starts cover every token
    val rebuilt = d1.map(_._2.split(" ").toSeq).zipWithIndex
      .flatMap { case (w, i) => w.drop(if (i == 0) 0 else 1) }
    assert(rebuilt.toSeq == Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("dupPassages: position-weighted cross-doc 5-gram dup fraction") {
    val docs = Seq(
      (1L, "a b c d e f"),              // grams: "a b c d e", "b c d e f"
      (2L, "x a b c d e"),              // grams: "x a b c d", "a b c d e"
      (3L, "a b c d e a b c d e"),      // contains the shared gram TWICE
      (4L, "p q r s"),                  // < 5 tokens: no grams, excluded
      (5L, "u v w x y z")               // all grams unique to doc 5
    ).toDF("doc_id", "text")
    val out = dupPassages(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 3's 6 positions: "a b c d e"×2 dup, "b c d e a", "c d e a b",
    // "d e a b c", "e a b c d" unique → 2/6
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 6L, 2L, 0.3333),
      (5L, 2L, 0L, 0.0)))
  }

  test("dupSpans: maximal islands of cross-doc duplicated 5-gram positions") {
    val docs = Seq(
      (1L, "a b c d e f g"),                       // fully shared with doc 2
      (2L, "z a b c d e f g"),                     // offset copy of doc 1
      (3L, "p q r s t u v"),                       // nothing shared
      (4L, "a b c d e x1 x2 x3 x4 x5 c d e f g"),  // two separate islands
      (5L, "m n o p q r m n o p q r")              // repeats only WITHIN itself
    ).toDF("doc_id", "text")
    val out = dupSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      (1L, 1, 7),   // every position duplicated: one span, the whole doc
      (2L, 2, 7),   // the copy starts one token in
      (4L, 1, 5),   // "a b c d e" island
      (4L, 11, 5))) // "c d e f g" island, separated by unique middles
    // doc 3 shares nothing; doc 5's repeats are within-doc only — the
    // cross-document definition excludes both
  }

  test("scrubDupSpans: cuts tokens covered by cross-doc 5-grams, keeps the rest") {
    val docs = Seq(
      (1L, "a b c d e f g"),                       // fully shared with doc 2
      (2L, "z a b c d e f g"),                     // offset copy: 'z' survives
      (3L, "p q r s t u v"),                       // nothing shared: untouched
      (4L, "a b c d e x1 x2 x3 x4 x5 c d e f g"),  // middle survives two islands
      (5L, "m n o p q r m n o p q r"),             // within-doc repeats: untouched
      (6L, "s t")                                  // < k tokens: no grams, untouched
    ).toDF("doc_id", "text")
    val out = scrubDupSpans(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 7, 0, ""),
      (2L, 8, 1, "z"),
      (3L, 7, 7, "p q r s t u v"),
      (4L, 15, 5, "x1 x2 x3 x4 x5"),
      (5L, 12, 12, "m n o p q r m n o p q r"),
      (6L, 2, 2, "s t")))
  }

  test("sourceOverlap: shared distinct 5-grams + Jaccard per source pair, df-capped") {
    val docs = Seq(
      ("A", "s t u v w"), ("A", "a b c d e f"),
      ("B", "s t u v w"), ("B", "z a b c d e"),
      ("C", "s t u v w")
    ).toDF("source", "text")
    // uncapped: A={stuvw,abcde,bcdef} B={stuvw,zabcd,abcde} C={stuvw}
    val full = sourceOverlap(docs, "source", "text", k = 5, dfCap = 16)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(full.toSeq == Seq(
      ("A", "B", 2L, 0.5),        // 2 / (3 + 3 - 2)
      ("A", "C", 1L, 0.333333),   // 1 / (3 + 1 - 1)
      ("B", "C", 1L, 0.333333)))
    // dfCap=2 drops "s t u v w" (df=3) BEFORE pairing; per-source totals
    // stay uncapped by contract, and pairs sharing nothing disappear
    val capped = sourceOverlap(docs, "source", "text", k = 5, dfCap = 2)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(capped.toSeq == Seq(("A", "B", 1L, 0.2))) // 1 / (3 + 3 - 1)
  }
}
