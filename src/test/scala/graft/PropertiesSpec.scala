package graft

import graft.functions.Functions._
import graft.operators.Dedup
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4). Inputs are generated
  * with ScalaCheck Gens (fixed seed → reproducible), evaluated in one
  * Spark batch per property.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }
      .take(n).toSeq

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val name = Gen.chooseNum(0, 5).flatMap(k =>
    Gen.listOfN(k + 1, word).map(_.mkString("_")))

  test("shortName output never has more than two '_' parts and is a prefix") {
    val inputs = sample(name, 300)
    val got = inputs.toDF("s")
      .select(col("s"), shortName(col("s")).as("out"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (in, out) =>
      assert(out.split("_").length <= 2, s"$in -> $out")
      assert(in.startsWith(out), s"$in -> $out")
      if (in.split("_").length <= 1) assert(out == in)
    }
  }

  test("fillByType never changes non-null values") {
    val rows = sample(Gen.zip(Gen.option(word), Gen.option(Gen.chooseNum(-100L, 100L))), 300)
    val df = rows.toDF("s", "n")
    val filled = fillByType(df).collect().zip(rows)
    filled.foreach { case (row, (s, n)) =>
      s.foreach(v => assert(row.getString(0) == v))
      n.foreach(v => assert(row.getLong(1) == v))
      if (s.isEmpty) assert(row.getString(0) == "Нет данных")
      if (n.isEmpty) assert(row.getLong(1) == 0L)
    }
  }

  test("jaccard is symmetric, bounded, and 1 on self for non-empty sets") {
    val text = Gen.listOfN(8, word).map(_.mkString(" "))
    val pairs = sample(Gen.zip(text, text), 150)
    val df = pairs.toDF("a", "b").select(
      Dedup.jaccard(Dedup.shingleSet(col("a")), Dedup.shingleSet(col("b"))).as("ab"),
      Dedup.jaccard(Dedup.shingleSet(col("b")), Dedup.shingleSet(col("a"))).as("ba"),
      Dedup.jaccard(Dedup.shingleSet(col("a")), Dedup.shingleSet(col("a"))).as("self"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("fingerprint is invariant under whitespace runs and case") {
    val text = Gen.listOfN(5, word).map(_.mkString(" "))
    val inputs = sample(text, 200)
    val mangled = inputs.map { s =>
      val spaced = s.replace(" ", "   ")
      (s, "  " + spaced.toUpperCase + " ")
    }
    val df = mangled.toDF("a", "b").select(
      (TextAnalysis.fingerprint(lower(col("a"))) ===
        TextAnalysis.fingerprint(lower(col("b")))).as("eq"))
    assert(df.collect().forall(_.getBoolean(0)))
  }

  test("minhash signature of identical shingle sets is identical; " +
    "signature similarity approximates Jaccard") {
    val text = Gen.listOfN(30, Gen.oneOf("альфа", "beta", "gamma", "дельта",
      "epsilon", "zeta", "eta", "theta")).map(_.mkString(" "))
    val pairs = sample(Gen.zip(text, text), 60)
    val shA = pairs.toDF("a", "b")
      .select(
        transform(Dedup.shingleSet(col("a")), s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL))).as("ha"),
        transform(Dedup.shingleSet(col("b")), s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL))).as("hb"),
        Dedup.jaccard(Dedup.shingleSet(col("a")), Dedup.shingleSet(col("b"))).as("jac"))
      .select(
        Dedup.minhashSignature(col("ha")).as("sa"),
        Dedup.minhashSignature(col("hb")).as("sb"),
        col("jac"))
    shA.collect().foreach { r =>
      val sa = r.getSeq[Long](0)
      val sb = r.getSeq[Long](1)
      val jac = r.getDouble(2)
      val sigSim = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
      // E[sigSim] = jac; with 64 hashes allow a generous band
      assert(math.abs(sigSim - jac) <= 0.35, s"sigSim=$sigSim jac=$jac")
    }
  }

  test("jaccardPairs (counting join) agrees with array-math jaccard on random docs") {
    // random short docs over a small vocabulary so overlaps actually occur
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" "))
    val docs = sample(doc, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sh = Dedup.shingled(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counting = Dedup.jaccardPairs(sh, "doc_id", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = sh.toDF("id_a", "sh_a")
    val b = sh.toDF("id_b", "sh_b")
    val arrays = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sh.unpersist()
    assert(counting == arrays)
  }

  test("HOF minhashSignature twin matches the grouped-agg banding path bit-for-bit") {
    val text = Gen.listOfN(25, Gen.oneOf("альфа", "beta", "gamma", "дельта",
      "epsilon", "zeta")).map(_.mkString(" "))
    val docs = sample(text, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sh = Dedup.shingled(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grouped = Dedup.lshBandsFromShingles(sh, "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rows = Dedup.NumHashes / Dedup.Bands
    val viaHof = sh.select(col("doc_id"),
        transform(col("sh"), s => TextAnalysis.hash32(s)).as("h32"))
      .select(col("doc_id"), Dedup.minhashSignature(col("h32")).as("sig"))
      .select(col("doc_id"), posexplode(array((0 until Dedup.Bands).map { b =>
        concat_ws(":", (0 until rows).map(r2 =>
          element_at(col("sig"), b * rows + r2 + 1)): _*)
      }: _*)).as(Seq("band", "band_key")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    sh.unpersist()
    assert(grouped == viaHof)
  }

  test("chunkDocs reconstructs the token stream for any doc and any " +
      "chunk/stride with stride <= chunk") {
    val docGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, word))
    val paramGen = for {
      chunk <- Gen.chooseNum(2, 12)
      stride <- Gen.chooseNum(1, chunk)
    } yield (chunk, stride)
    sample(paramGen, 8).foreach { case (chunk, stride) =>
      val docs = sample(docGen, 40).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      val out = TextAnalysis.chunkDocs(docs.toDF("doc_id", "text"),
        "doc_id", "text", chunk, stride)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(r =>
          (r.getInt(1), r.getString(2).split(" ").toSeq, r.getInt(3))).toSeq)
        .toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").toSeq
        val chunks = out(id)
        // windows at every stride offset below n, ids consecutive
        assert(chunks.map(_._1) == chunks.indices.toSeq)
        assert(chunks.size == (toks.size + stride - 1) / stride)
        chunks.zipWithIndex.foreach { case ((_, w, n), i) =>
          val start = i * stride
          // each window is EXACTLY the slice of the token stream
          assert(w == toks.slice(start, start + chunk),
            s"chunk=$chunk stride=$stride window $i of $toks")
          assert(n == math.min(chunk, toks.size - start))
        }
        // dropping each window's overlap re-creates the stream exactly
        val rebuilt = chunks.zipWithIndex.flatMap { case ((_, w, _), i) =>
          if (i == 0) w else w.drop(chunk - stride) }
        // trailing sub-stride windows repeat covered tokens; the
        // PREFIX property is the lossless-coverage invariant
        assert(rebuilt.startsWith(toks) || toks.startsWith(rebuilt))
        assert(rebuilt.toSet == toks.toSet)
      }
    }
  }

  test("explodeOnce ≡ explode for any docs with non-null array elements") {
    // random texts including empties and whitespace runs: empty/short
    // docs hit the empty-array stub, the rest explode normally. The
    // equivalence is the whole contract of the generator-hygiene
    // rewrite — if the null-stub drop ever diverges from explode
    // semantics, every converted dedup/hygiene operator shifts.
    val text = Gen.chooseNum(0, 9).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val docs = sample(text, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val arr = Dedup.wordNgrams(TextAnalysis.tokens(col("text")), 3)
    val viaExplode = docs.select(col("id"), explode(arr).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val viaOnce = explodeOnce(docs, Seq(col("id")), arr, "g")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaOnce.sameElements(viaExplode))
  }
}
