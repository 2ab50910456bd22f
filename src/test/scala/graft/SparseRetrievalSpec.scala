package graft

import org.apache.spark.sql.functions._

/** BM25 + RRF: both rankers and the fusion are replayed bitwise on the
  * driver from the raw corpus.
  */
class SparseRetrievalSpec extends SparkSpec {
  import operators.SparseRetrieval

  private def q6(x: Double): Long =
    BigDecimal(x * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Driver-side postings: tokenization mirrors TextAnalysis.tokens. */
  private lazy val replayBase = {
    val docs = sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
    val tf = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (d, t, xs.size.toLong) } }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val dl = tf.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._3).sum }
    val n = dl.size.toLong
    val avgdl = dl.values.sum * 1.0 / n
    (tf, df, dl, n, avgdl)
  }

  /** Per-(query, doc) quantized-sum scores for one ranker. */
  private def replayScores(bm25: Boolean): Map[(Long, Long), Long] = {
    val (tf, df, dl, n, avgdl) = replayBase
    SparseRetrieval.panel.flatMap { case (qid, term) =>
      tf.filter(_._2 == term).map { case (d, _, f) =>
        val s =
          if (bm25)
            math.log(1 + (n - df(term) + 0.5) / (df(term) + 0.5)) *
              (f * 2.2) / (f + 1.2 * (1 - 0.75 + 0.75 * dl(d) / avgdl))
          else f * math.log((n + 1.0) / (df(term) + 1.0))
        ((qid, d), q6(s))
      }
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
  }

  private def rank(scores: Map[(Long, Long), Long], top: Int): Map[(Long, Long), Int] =
    scores.toSeq.groupBy(_._1._1).flatMap { case (_, xs) =>
      xs.sortBy { case ((_, d), s) => (-s, d) }.take(top)
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }
    }

  test("q_bm25 matches a bitwise driver replay") {
    val expected = rank(replayScores(bm25 = true), 10).keySet.toSeq
      .map { case (q, d) => (q, d,
        BigDecimal(replayScores(bm25 = true)(q -> d) / 1000000.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.registry("q_bm25").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected, s"spark=${got.take(4)} replay=${expected.take(4)}")
    InternalCaches.drain(blocking = true)
  }

  test("q_rrf_fuse matches the fused driver replay") {
    val rBm = rank(replayScores(bm25 = true), 20)
    val rTi = rank(replayScores(bm25 = false), 20)
    val expected = (rBm.keySet ++ rTi.keySet).toSeq
      .map { k =>
        val rrf = rBm.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rTi.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (k._1, k._2, rrf)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        xs.sortBy { case (_, d, m) => (-m, d) }.take(5) }
      .map { case (q, d, m) => (q, d,
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.registry("q_rrf_fuse").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected, s"spark=${got.take(4)} replay=${expected.take(4)}")
    // a doc fused from both lists outranks pure single-list stragglers
    // structurally: every rrf value is within the achievable bounds
    assert(got.forall { case (_, _, m) => m > 0.0 && m <= 2.0 / 61.0 + 1e-9 })
    InternalCaches.drain(blocking = true)
  }
}
