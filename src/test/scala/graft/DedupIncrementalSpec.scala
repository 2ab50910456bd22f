package graft

import org.apache.spark.sql.functions._

/** Incremental near-dedup and containment: the batch-vs-index probe
  * must emit exactly the cross-set slice of the full-corpus run (reuse
  * invisible), and containment must catch the pasted-subset pair that
  * symmetric Jaccard scores low — with the tie and direction rules
  * pinned.
  */
class DedupIncrementalSpec extends SparkSpec {
  import operators.{Dedup, DedupIncremental}

  test("incremental probe ≡ cross-set slice of the full-corpus near-dup run") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val full = Dedup.minhashNearDups(docs, "doc_id", "text", minJaccard = 0.25)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 10 == 9) != (b % 10 == 9) }
      .map { case (a, b) => if (a % 10 == 9) (a, b) else (b, a) }
      .toSet
    val inc = SparkEntry.registry("q_dedup_incremental").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full,
      s"incremental ${inc.size} pairs vs full-run cross-set ${full.size}")
    InternalCaches.drain(blocking = true)
  }

  test("containment flags a pasted subset that Jaccard misses") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i")
    val a = words.mkString(" ") // 60 tokens
    val b = words.slice(9, 35).mkString(" ") // contiguous slice of a
    val c = (1 to 60).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = DedupIncremental.containmentPairs(docs,
      minContainment = 0.9, minSmall = 5L).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getDouble(2) == 1.0) // every shingle of b is in a
    assert(r.getLong(3) == 2L) // the smaller (contained) doc drops
    // the motivating gap: symmetric Jaccard of the same pair is low
    val jac = Dedup.jaccardScored(
      Dedup.shingled(docs, "doc_id", "text"), "doc_id")
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .selectExpr("CAST(__inter AS DOUBLE) / (__na + __nb - __inter)")
      .head().getDouble(0)
    assert(jac < 0.5, s"Jaccard $jac should sit below any dedup threshold")
    InternalCaches.drain(blocking = true)
  }

  test("engineered fixture: cross-set pairs found, within-set pairs NOT reported") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val variant = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
    val other = (1 to 30).map(i => s"alt$i").mkString(" ")
    val docs = Seq(
      3L -> base, // old
      13L -> base, // old, duplicate of 3 — within-set, must NOT appear
      9L -> variant, // new, near-dup of the old 3 and 13
      19L -> variant, // new, duplicate of 9 — within-set, must NOT appear
      4L -> other, 7L -> other.replace("alt3", "altX"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_incfix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.registry("q_dedup_incremental").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the new variants pair with BOTH old copies of the base text,
    // and only those cross-set pairs surface
    assert(got.map(t => (t._1, t._2)).toSet ==
      Set((9L, 3L), (9L, 13L), (19L, 3L), (19L, 13L)))
    assert(got.forall(_._3 >= 0.25))
    InternalCaches.drain(blocking = true)
  }

  test("q_minhash_recall: a report row whose counts reconcile") {
    val r = SparkEntry.registry("q_minhash_recall").fn(spark, sfDir).head()
    val (nTrue, nCand, nHit, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nHit <= math.min(nTrue, nCand))
    assert(recall >= 0.0 && recall <= 1.0)
    assert(recall == math.rint(nHit.toDouble / nTrue * 10000) / 10000)
    InternalCaches.drain(blocking = true)
  }

  test("containment tie: identical shingle sets drop the larger id") {
    import spark.implicits._
    val t = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, t), (9L, t)).toDF("doc_id", "text")
    val got = DedupIncremental.containmentPairs(docs,
      minContainment = 0.9, minSmall = 5L).collect()
    assert(got.length == 1 && got.head.getLong(3) == 9L)
    InternalCaches.drain(blocking = true)
  }
}
