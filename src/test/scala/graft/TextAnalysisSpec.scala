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
}
