package graft

import graft.operators.Dedup._
import graft.operators.TextAnalysis.tokens
import org.apache.spark.sql.functions._

/** Dedup operators: exact Jaccard math, MinHash-LSH parity vs brute
  * force, SimHash invariants. All deterministic (seed-42 hash params).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the lazy cat"),
    (4L, "completely different words entirely unrelated text corpus here"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("jaccard: identical 1.0, known overlap, disjoint 0.0, empty 0.0") {
    val sh = docs.select(col("doc_id"), shingleSet(col("text")).as("sh"))
    val a = sh.toDF("id_a", "sh_a")
    val b = sh.toDF("id_b", "sh_b")
    val jac = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) == 1.0)
    // docs 1 vs 3: 7 shingles each, 6 shared → 6/8
    assert(math.abs(jac((1L, 3L)) - 0.75) < 1e-9)
    assert(jac((1L, 4L)) == 0.0)
    // doc 5 has <3 tokens → empty shingle set → 0 against everything
    assert(jac((1L, 5L)) == 0.0)
  }

  test("minhash-LSH near-dups match brute-force exact Jaccard at the threshold") {
    val lsh = minhashNearDups(docs, "doc_id", "text", minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minhash-LSH on the harness corpus: every reported pair meets the threshold, " +
    "and recall vs brute force is total at J>=0.5") {
    val corpus = graft.sources.Tables.table(spark, sfDir, "documents")
    val lsh = minhashNearDups(corpus, "doc_id", "text", minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over all pairs
    val sh = corpus.select(col("doc_id"), shingleSet(col("text")).as("sh"))
    val brute = sh.toDF("id_a", "sh_a")
      .crossJoin(sh.toDF("id_b", "sh_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step guarantees precision; 32 bands × 2 rows makes
    // a miss at J>=0.5 astronomically unlikely (and seed-fixed).
    assert(lsh == brute)
  }

  test("simhash: identical texts collide, hamming is symmetric and 0 on self") {
    val sigs = docs.select(col("doc_id"), simhash(tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    // bit_count yields IntegerType
    val h = spark.range(1).select(
      hamming(lit(sigs(1L)), lit(sigs(3L))).as("d13"),
      hamming(lit(sigs(3L)), lit(sigs(1L))).as("d31"),
      hamming(lit(sigs(1L)), lit(sigs(1L))).as("self")).head()
    assert(h.getInt(0) == h.getInt(1))
    assert(h.getInt(2) == 0)
    // near-identical docs are much closer than unrelated ones
    assert(h.getInt(0) < spark.range(1)
      .select(hamming(lit(sigs(1L)), lit(sigs(4L)))).head().getInt(0))
  }

  test("simhashNearDups finds the identical pair at distance 0") {
    val pairs = simhashNearDups(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("cosine: orthogonal 0, identical 1, known angle") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b").select(cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("stop-shingle ceiling: a viral shingle stops generating candidates, " +
      "rare-shingle pairs survive") {
    // every doc shares the viral 3-gram; only 1&2 also share a rare one
    val viral = Seq(
      (1L, "click here to win now alpha beta"),
      (2L, "click here to win now alpha beta"),
      (3L, "click here to sign up quickly"),
      (4L, "click here to unsubscribe from this")
    ).toDF("doc_id", "text")
    val sh = shingled(viral, "doc_id", "text")
    // uncapped: the shared "click here to" makes all 6 pairs candidates
    val uncapped = postingListCandidates(sh, "doc_id", dfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 6)
    // df cap 3 kills the viral shingle (df=4); 1&2 still pair via
    // their rare shared grams, the viral-only pairs disappear
    val capped = postingListCandidates(sh, "doc_id", dfCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }

  test("q_dedup_embedding: block-structured exact all-pairs — equi-join plan, " +
      "no nested loop") {
    val plan = graft.operators.Dedup.defs("q_dedup_embedding")
      .fn(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q_dedup_embedding_ann returns a SUBSET of the exact pairs with " +
      "identical cosines — the LSH recall contract") {
    val exact = graft.operators.Dedup.defs("q_dedup_embedding")
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = graft.operators.Dedup.defs("q_dedup_embedding_ann")
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ann.nonEmpty, "ANN variant found no pairs at all")
    ann.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"ANN pair $pair (cos=$cos) not in the exact pair set")
    }
    // and its plan is the bucket equi-join, never a cross product
    val plan = graft.operators.Dedup.defs("q_dedup_embedding_ann")
      .fn(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("wordNgrams: short inputs give empty arrays, order preserved") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(wordNgrams(tokens(col("t")), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("simhashNearDups at radius 3 is EXACT: pigeonhole blocking finds every " +
      "brute-force pair") {
    import spark.implicits._
    // vocabulary small enough that signatures actually collide
    val vocab = Vector("data", "spark", "join", "hash", "text", "near", "dup")
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 80).map(i =>
      (i.toLong, Seq.fill(6)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val got = simhashNearDups(corpus, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the convenience 64-bit signature (same md5
    // slices — also proves the two signature code paths agree)
    val sigs = corpus.select(col("doc_id"),
      simhash(tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(got == brute)
  }

  test("jaccardScored: capped and uncapped paths agree when the cap does not bind") {
    // The two branches compute set sizes differently (ride-along __n0
    // vs pruned-index counts — round-8 restructure); with a cap above
    // every shingle's df they must produce identical (pair, inter,
    // na, nb) rows. A df above the harness corpus size makes the cap
    // provably non-binding.
    val corpus = graft.sources.Tables.table(spark, sfDir, "documents")
      .limit(200)
    val sh = shingled(corpus, "doc_id", "text")
    def rows(dfCap: Int) = jaccardScored(sh, "doc_id", dfCap)
      .select("id_a", "id_b", "__inter", "__na", "__nb")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val uncapped = rows(Int.MaxValue)
    val cappedLoose = rows(1000000)
    assert(uncapped == cappedLoose,
      s"paths diverge: only-uncapped=${(uncapped -- cappedLoose).take(3)} " +
        s"only-capped=${(cappedLoose -- uncapped).take(3)}")
    assert(uncapped.nonEmpty, "fixture yields no overlapping pairs")
  }
}
