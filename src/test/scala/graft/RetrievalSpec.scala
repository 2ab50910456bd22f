package graft

import org.apache.spark.sql.functions._

/** Retrieval eval + bitext mining: recall@k is self-calibrated (the
  * exact index must grade 1.0), and the margin miner is replayed
  * bitwise on the driver.
  */
class RetrievalSpec extends SparkSpec {
  import operators.{Retrieval, Similarity}

  private def embeddings = sources.Tables.table(spark, sfDir, "embeddings")

  test("recallAtK grades the exact index at 1.0 for every query") {
    val r = Retrieval.recallAtK(embeddings,
      embeddings.filter(col("vec_id") < 32), k = 3,
      index = Similarity.bruteForceTopK(_, _, _))
      .collect()
    assert(r.length == 32)
    assert(r.forall(_.getDouble(2) == 1.0))
  }

  test("q_recall_at_k: every panel query reports, hits bounded by k") {
    val r = SparkEntry.registry("q_recall_at_k").fn(spark, sfDir).collect()
    assert(r.map(_.getLong(0)).toSeq == (0L until 32L))
    assert(r.forall(row => row.getLong(1) >= 0 && row.getLong(1) <= 3))
    // recall is exactly hits/k rounded — no drift between the columns
    assert(r.forall(row => row.getDouble(2) ==
      BigDecimal(row.getLong(1) / 3.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // the 8-bit multi-probe LSH index is not useless at smoke scale
    assert(r.map(_.getLong(1)).sum > 0)
  }

  test("q_bitext_margin matches a bitwise driver replay") {
    val rows = embeddings.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
      r.getAs[Int]("label")))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def q6(x: Double): Long =
      BigDecimal(x * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val a = rows.filter(_._3 == 0)
    val b = rows.filter(_._3 == 1)
    val scored = for ((qid, qv, _) <- a; (pid, pv, _) <- b)
      yield (qid, pid,
        q6(dot(qv, pv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(pv, pv)))))
    val denq = scored.groupBy(_._1).map { case (q, xs) =>
      q -> xs.sortBy(t => (-t._3, t._2)).take(4).map(_._3).sum }
    val denp = scored.groupBy(_._2).map { case (p, xs) =>
      p -> xs.sortBy(t => (-t._3, t._1)).take(4).map(_._3).sum }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (q, xs) =>
      val best = xs.map { case (_, p, c) =>
        (p, 8.0 * c / (denq(q) + denp(p))) }
        .minBy { case (p, m) => (-m, p) }
      val rounded = BigDecimal(best._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (rounded > 1.0) Some((q, best._1, rounded)) else None
    }.sortBy(_._1)
    val got = SparkEntry.registry("q_bitext_margin").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected,
      s"spark=${got.take(5)}... vs replay=${expected.take(5)}...")
    // structural guards: one pair per query, cross-label only
    val labels = rows.map(t => t._1 -> t._3).toMap
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall { case (q, p, _) => labels(q) == 0 && labels(p) == 1 })
  }
}
