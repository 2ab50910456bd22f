package graft

import org.apache.spark.sql.functions._

/** Hashed tf-idf vector dedup: the term-profile signal must catch the
  * REORDERED near-dup positional shingles score at zero, vectors must
  * match an exact driver replay, and zero-norm docs must never emit.
  */
class TfidfDedupSpec extends SparkSpec {
  import operators.{Dedup, TfidfDedup}

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("reordered text: cosine 1.0 where shingle Jaccard is 0") {
    val words = (1 to 12).map(i => s"w$i")
    val fwd = words.mkString(" ")
    val rev = words.reverse.mkString(" ")
    val other = (1 to 12).map(i => s"z$i").mkString(" ")
    val d = docs(1L -> fwd, 2L -> rev, 3L -> other)
    val got = TfidfDedup.tfidfNearDups(d, "doc_id", "text", minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical term profiles → identical vectors → exactly 1.0
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
    // the positional family scores the same pair at ZERO: every
    // 3-gram shingle of the reversed text is new
    val jac = Dedup.jaccardScored(
      Dedup.shingled(d.filter(col("doc_id") <= 2), "doc_id", "text"),
      "doc_id", dfCap = Int.MaxValue)
      .collect()
    assert(jac.isEmpty, "reversed text should share no shingle at all")
    InternalCaches.drain(blocking = true)
  }

  test("vectors match an exact integer driver replay") {
    val texts = Map(1L -> "a a b c", 2L -> "b c d")
    val d = docs(texts.toSeq: _*)
    val got = TfidfDedup.tfidfVectors(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("v").toArray).toMap
    // driver replay with the same md5 nibbles and quantized idf
    def h32(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 8), 16)
    }
    def sign(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(md5.substring(8, 9), 16) % 2 == 0) 1L else -1L
    }
    val tfs = texts.view.mapValues(_.split(" ").groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }).toMap
    val dfm = tfs.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val n = texts.size.toLong
    texts.keys.foreach { id =>
      val v = Array.fill(64)(0L)
      tfs(id).foreach { case (t, tf) =>
        val idfq = math.floor(
          math.log((n + 1.0) / (dfm(t) + 1.0)) * TfidfDedup.IdfQ + 0.5).toLong
        v((h32(t) % 64).toInt) += sign(t) * tf * idfq
      }
      assert(got(id).toSeq == v.map(_.toDouble).toSeq, s"doc $id vector")
    }
    InternalCaches.drain(blocking = true)
  }

  test("zero-norm docs (every term at idf 0) never pair") {
    // one shared term in BOTH docs of a 2-doc corpus: df = n → idf_q =
    // floor(ln(3/3)·1024 + .5) = 0 → both vectors all-zero
    val d = docs(1L -> "x x x", 2L -> "x")
    assert(TfidfDedup.tfidfNearDups(d, "doc_id", "text", 0.0).count() == 0)
    InternalCaches.drain(blocking = true)
  }
}
