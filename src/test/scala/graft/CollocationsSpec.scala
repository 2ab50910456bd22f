package graft

import org.apache.spark.sql.functions._

/** PMI collocations and positional phrase search: the PMI arithmetic
  * is replayed exactly on the driver for a hand corpus, the top-k cut
  * is pinned, and phrase matching is checked against the classic
  * bag-of-words false positive (terms present, never adjacent) plus
  * the repeated-term-phrase edge the DISTINCT position count guards.
  */
class CollocationsSpec extends SparkSpec {
  import operators.Collocations

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  /** Driver replay of pmiPairs' exact arithmetic. */
  private def replayPmi(texts: Seq[String]): Map[(String, String), (Long, Double)] = {
    val bgs = texts.map(_.trim.toLowerCase.split("\\s+").toSeq)
      .filter(_.size >= 2)
      .flatMap(t => t.zip(t.tail))
    val c12 = bgs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val c2 = c12.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val n = c12.values.sum
    c12.map { case ((w1, w2), c) =>
      val s6 = math.round(1000000.0 *
        math.log((c * n).toDouble / (c1(w1) * c2(w2)).toDouble))
      (w1, w2) -> (c, math.rint(s6 / 1000000.0 * 10000) / 10000)
    }
  }

  test("pmiPairs matches an exact driver replay on a hand corpus") {
    val texts = Seq("a b a b", "c d", "a d")
    val got = Collocations.pmiPairs(docs(texts: _*), minCount = 1L, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == replayPmi(texts))
    // spot the hand value: pmi(b→a) = ln(1·5 / (1·1)) = ln 5
    assert(got(("b", "a"))._2 == math.rint(math.log(5.0) * 10000) / 10000)
  }

  test("top-k keeps the k highest-PMI pairs; min-count cuts hapax pairs") {
    val texts = Seq("a b a b", "c d", "a d")
    val top2 = Collocations.pmiPairs(docs(texts: _*), minCount = 1L, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // ln5 (b,a) and ln2.5 (c,d) beat ln1.67 (a,b) and ln0.83 (a,d)
    assert(top2 == Set(("b", "a"), ("c", "d")))
    val kept = Collocations.pmiPairs(docs(texts: _*), minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("a", "b"))) // the only pair with c12 ≥ 2
  }

  test("phraseHits: adjacency required, repeats counted, arity exact") {
    val panel = Collocations.phrasePanel ++ Seq((3L, 0, "go", 2), (3L, 1, "go", 2))
    val d = docs(
      "hash join x", // phrase 0: 1 hit
      "join hash", // both terms, wrong order: the bag-of-words trap
      "hash join y hash join", // phrase 0: 2 hits
      "sort merge batch", // phrase 2 (3-term): 1 hit
      "sort batch merge", // 3-term permutation: no hit
      "go go go", // repeated-term phrase 3: starts 0 and 1 → 2 hits
      "go x go") // repeated term, gap: DISTINCT-pip gate rejects
    val got = Collocations.phraseHits(d, panel)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 1L, (0L, 2L) -> 2L, (2L, 3L) -> 1L,
      (3L, 5L) -> 2L))
  }

  test("distinctNgrams: hand ratios, null tails excluded both sides") {
    import spark.implicits._
    val d = Seq(("x", "a b a b"), ("y", "c c c c c"))
      .toDF("source", "text")
    val got = Collocations.distinctNgrams(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // x: 4 tokens {a,b}; bigrams "a b","b a","a b" → 2/3; trigrams
    // "a b a","b a b" → 2/2
    assert(got("x") == ((4L, 2L, 0.5, 0.6667, 1.0)))
    // y is pure repetition: every ratio collapses toward 1/n
    assert(got("y") == ((5L, 1L, 0.2, 0.25, 0.3333)))
  }

  test("q_split_leakage matches an exact driver replay") {
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val us = ev.map(_._2)
    val mid = us.min + (us.max - us.min) / 2
    val byUser = ev.groupBy(_._1).view.mapValues(_.map(_._2))
    val tr = byUser.count(_._2.exists(_ < mid))
    val evl = byUser.count(_._2.exists(_ >= mid))
    val leak = byUser.count(v => v._2.exists(_ < mid) && v._2.exists(_ >= mid))
    val r = SparkEntry.registry("q_split_leakage").fn(spark, sfDir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((tr.toLong, evl.toLong, leak.toLong)))
    assert(r.getDouble(3) ==
      math.rint(leak.toDouble / evl * 10000) / 10000)
  }

  test("q_pmi_pairs / q_phrase_hits run on harness data") {
    val pmi = SparkEntry.registry("q_pmi_pairs").fn(spark, sfDir).collect()
    assert(pmi.nonEmpty && pmi.length <= 30)
    // declared ordering: (w1, w2)
    val keys = pmi.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
    val ph = SparkEntry.registry("q_phrase_hits").fn(spark, sfDir)
    assert(ph.columns.toSeq == Seq("phrase_id", "doc_id", "n_hits"))
  }
}
