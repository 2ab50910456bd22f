package graft

import graft.operators.Hygiene
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators: PII scrub completeness, repetition
  * metrics on hand-computed fixtures, decontamination hit logic.
  */
class HygieneSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii removes every URL, email, phone, card, and IPv4; " +
      "keeps clean text") {
    val df = Seq(
      "mail me at bob.smith+x@corp.example.co and visit https://a.b/c?d=1",
      "server at 192.168.0.1 rebooted",
      "nothing sensitive here",
      "edge 1.2.3.4 and user@host.io together https://x.io/%20p",
      "call +1 (555) 123-4567 or +44 20 7946 0958 now",
      "card 4111 1111 1111 1111 and compact 4111111111111111 too",
      "phone +15551234567 then pay 5500-0000-0000-0004"
    ).toDF("text").select(Hygiene.scrubPii(col("text")).as("s"))
    val scrubbed = df.as[String].collect()
    assert(scrubbed(0) == "mail me at <EMAIL> and visit <URL>")
    assert(scrubbed(1) == "server at <IP> rebooted")
    assert(scrubbed(2) == "nothing sensitive here")
    assert(scrubbed(3) == "edge <IP> and <EMAIL> together <URL>")
    assert(scrubbed(4) == "call <PHONE> or <PHONE> now")
    assert(scrubbed(5) == "card <CARD> and compact <CARD> too")
    assert(scrubbed(6) == "phone <PHONE> then pay <CARD>")
    // nothing PII-shaped survives any scrubbed output
    val leftover = df.filter(
      col("s").rlike(Hygiene.UrlRe) || col("s").rlike(Hygiene.EmailRe) ||
        col("s").rlike(Hygiene.PhoneRe) || col("s").rlike(Hygiene.CardRe) ||
        col("s").rlike(Hygiene.Ipv4Re)).count()
    assert(leftover == 0)
  }

  test("repetition metrics match hand computation") {
    val docs = Seq(
      (1L, "a a a b"),        // top1 = a:3/4; bigrams: "a a" 2/3; distinct 2
      (2L, "x y z w"),        // no repetition
      (3L, "solo")            // single token: no bigrams
    ).toDF("doc_id", "text")
    val m = Hygiene.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getLong(1) == 4L)
    assert(m(0).getDouble(2) == 0.5)      // 1 - 2/4
    assert(m(0).getDouble(3) == 0.75)     // a: 3/4
    assert(m(0).getDouble(4) == 0.6667)   // "a a": 2/3
    assert(m(1).getDouble(2) == 0.0)
    assert(m(1).getDouble(3) == 0.25)
    assert(m(1).getDouble(4) == 0.3333)   // all bigrams count 1 of 3
    assert(m(2).getLong(1) == 1L)
    assert(m(2).getDouble(4) == 0.0)      // no bigrams → coalesced 0
  }

  test("decontaminateByFingerprint catches an edited near-copy that " +
      "production-size n-grams miss") {
    val baseToks = (0 until 30).map(i => f"tok$i%02d")
    val bench = baseToks.mkString(" ")
    // edits every 8 tokens (positions 7, 15, 23): EVERY 8-gram spans
    // an edit → exact n=8 decontamination finds zero overlap, while
    // window minima between the edits survive (4 of 9 fingerprints,
    // deterministic md5 math — verified by simulation)
    val edited = baseToks.zipWithIndex.map { case (t, i) =>
      if (i == 7 || i == 15 || i == 23) s"ED$i" else t }.mkString(" ")
    val docs = Seq(
      (0L, bench),                                   // benchmark (id % 59 == 0)
      (1L, edited),
      (2L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val exact8 = Hygiene.decontaminate(docs, "doc_id", "text",
      pmod(col("doc_id"), lit(59)) === 0, n = 8).collect()
    assert(exact8.isEmpty, "n=8 grams should all span the edit")
    val fp = Hygiene.decontaminateByFingerprint(docs, "doc_id", "text",
      pmod(col("doc_id"), lit(59)) === 0).collect()
    assert(fp.map(_.getLong(0)).toSeq == Seq(1L), "fp decontam must flag doc 1")
    assert(fp(0).getAs[Long]("n_shared") >= 2)
    InternalCaches.drain(blocking = true)
  }

  test("decontaminateSemantic flags a planted paraphrase, ignores an " +
      "orthogonal doc, ties break to the smaller eval_id, hit counts " +
      "add up") {
    // eval ids ≡ 5 (mod 13): 5 and 18 carry the SAME direction, so a
    // train vector near it must hit BOTH and argmax must pick 5; 31 is
    // orthogonal to everything else
    val ex = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val ey = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val rows = Seq(
      (5L, ex), (18L, ex), (31L, ey),                   // eval slice
      (1L, Array(0.99f, 0.141f, 0.0f, 0.0f)),           // ~x: contaminated
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),              // orthogonal: clean
      (3L, Array(0.7f, 0.7f, 0.0f, 0.0f))               // 45°: hits all three? x pair + y
    ).toDF("vec_id", "embedding")
    val got = Hygiene.decontaminateSemantic(rows,
        pmod(col("vec_id"), lit(13)) === 5, tau = 0.5)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc 1: cos(x-ish, x) ≈ 0.99 against eval 5 AND 18 (tie → 5)
    // doc 2: no eval above 0.5
    // doc 3: cos 0.7071 against 5, 18, 31 — three hits, argmax tie → 5
    assert(got.map(_._1).toSeq == Seq(1L, 3L), got.mkString(", "))
    val d1 = got(0); val d3 = got(1)
    assert(d1._2 == 5L && d1._4 == 2L, s"doc1: $d1")
    assert(d1._3 > 0.98 && d1._3 < 1.0)
    assert(d3._2 == 5L && d3._4 == 3L, s"doc3: $d3")
    assert(math.abs(d3._3 - 0.7071) < 1e-9)
  }

  test("semanticGate admits exactly the complement of the audit's " +
      "flagged set on harness data") {
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val isEval = pmod(col("vec_id"), lit(13)) === 5
    val train = e.filter(!isEval)
    val kept = Hygiene.semanticGate(train, e.filter(isEval), tau = 0.3)
      .select("vec_id").as[Long].collect().toSet
    val flagged = Hygiene.decontaminateSemantic(e, isEval, tau = 0.3)
      .select("vec_id").as[Long].collect().toSet
    val all = train.select("vec_id").as[Long].collect().toSet
    assert(flagged.nonEmpty && kept.nonEmpty)
    assert(kept == all -- flagged,
      s"gate/audit disagree: ${(kept -- (all -- flagged)).take(5)} / " +
        s"${((all -- flagged) -- kept).take(5)}")
  }

  test("decontaminate counts benchmark 3-gram overlap per corpus doc") {
    val docs = Seq(
      (0L, "the quick brown fox jumps high"),   // benchmark (id % 97 == 0)
      (1L, "the quick brown fox sleeps now"),   // shares 2 grams with bench
      (2L, "completely different words here today friend"), // no overlap
      (3L, "a the quick brown fox jumps")       // shares 3 grams
    ).toDF("doc_id", "text")
    val out = Hygiene.decontaminate(docs, "doc_id", "text",
      pmod(col("doc_id"), lit(97)) === 0)
      .orderBy("doc_id").collect()
    // only overlapping corpus docs are reported; benchmark docs excluded
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getLong(1) == 2L)  // "the quick brown", "quick brown fox"
    assert(out(0).getInt(2) == 4)
    assert(out(1).getLong(1) == 3L)  // + "brown fox jumps"
    assert(out(1).getInt(2) == 4)
    assert(out(1).getDouble(3) == 0.75)
  }

  test("synthLines groups tokens into 12-token lines, short tail kept") {
    val toks = (1 to 27).map(i => s"w$i").mkString(" ")
    val lines = Seq(toks).toDF("text")
      .select(Hygiene.synthLines(col("text")).as("ls"))
      .as[Seq[String]].head()
    assert(lines.length == 3)
    assert(lines(0) == (1 to 12).map(i => s"w$i").mkString(" "))
    assert(lines(1) == (13 to 24).map(i => s"w$i").mkString(" "))
    assert(lines(2) == "w25 w26 w27")
    // empty text degrades to one empty line, never a crash
    val empty = Seq("").toDF("text")
      .select(Hygiene.synthLines(col("text")).as("ls"))
      .as[Seq[String]].head()
    assert(empty == Seq(""))
  }

  test("cleanLines applies the C4 rules: min words, blacklist " +
      "(case-insensitive whole word), terminal punctuation") {
    val docs = Seq(
      (1L, Seq(
        "This sentence has exactly enough words to survive the filter.",
        "too short.",
        "Enable JavaScript and cookies to continue browsing this site now.",
        "No terminal punctuation so this line dies under the rule here")),
      (2L, Seq.empty[String])
    ).toDF("doc_id", "lines")
    val out = Hygiene.cleanLines(docs, "doc_id", col("lines"),
      minWords = 5, blacklist = Seq("javascript", "cookies"),
      requireTerminal = true).orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 4 && out(0).getInt(2) == 1)
    assert(out(0).getDouble(3) == 0.25)
    // blacklist must be whole-word: "cookie-cutter" is not "cookies"
    val loose = Seq((1L, Seq("the cookie-cutter approach works well here")))
      .toDF("doc_id", "lines")
    val kept = Hygiene.cleanLines(loose, "doc_id", col("lines"),
      minWords = 3, blacklist = Seq("cookie", "cookies")).collect()
    assert(kept(0).getInt(2) == 1, "hyphenated compound must survive")
    // empty doc: zero lines, kept_frac guarded to 0
    assert(out(1).getInt(1) == 0 && out(1).getDouble(3) == 0.0)
    // metacharacter blacklist entries are literals, not regex: "c++"
    // matches the word c++ (not "c" via a crippled pattern) and
    // "a.b" does not swallow "a5b"
    val meta = Seq(
      (1L, Seq("we write c++ at work every single day")),
      (2L, Seq("token a5b appears here with words around it")),
      (3L, Seq("literal a.b appears here with words around it")))
      .toDF("doc_id", "lines")
    val mOut = Hygiene.cleanLines(meta, "doc_id", col("lines"),
      minWords = 3, blacklist = Seq("c++", "a.b"))
      .orderBy("doc_id").collect()
    assert(mOut(0).getInt(2) == 0, "c++ line must be blacklisted")
    assert(mOut(1).getInt(2) == 1, "a5b must NOT match literal a.b")
    assert(mOut(2).getInt(2) == 0, "a.b line must be blacklisted")
  }

  test("dedupLinesAcross drops lines shared by >maxDocs docs from " +
      "every doc, preserves order, keeps all docs in the output") {
    val docs = Seq(
      (1L, Seq("unique one", "shared footer", "unique two")),
      (2L, Seq("shared footer", "only in two")),
      (3L, Seq("shared footer"))   // every line dropped
    ).toDF("doc_id", "lines")
    val out = Hygiene.dedupLinesAcross(docs, "doc_id", col("lines"))
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(2) == 2 && out(0).getInt(3) == 1)
    val expectedFp = Seq("unique one\nunique two").toDF("t")
      .select(md5(col("t"))).as[String].head()
    assert(out(0).getString(4) == expectedFp, "order must survive the drop")
    assert(out(2).getInt(2) == 0 && out(2).getInt(3) == 1)
    val emptyFp = Seq("").toDF("t").select(md5(col("t"))).as[String].head()
    assert(out(2).getString(4) == emptyFp)
    // a line duplicated WITHIN one doc is not cross-doc boilerplate
    val intra = Seq(
      (1L, Seq("echo echo", "echo echo")),
      (2L, Seq("other text"))).toDF("doc_id", "lines")
    val kept = Hygiene.dedupLinesAcross(intra, "doc_id", col("lines"))
      .orderBy("doc_id").collect()
    assert(kept(0).getInt(2) == 2, "intra-doc repeats survive maxDocs=1")
    InternalCaches.drain(blocking = true)
  }
}
