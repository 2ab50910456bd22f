package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning vs an independent in-memory reference. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference trainer (Sennrich et al. 2016, fig. 1):
    * no Spark, no shared code with the operator under test.
    */
  private def referenceMerges(vocab: Map[String, Long],
      numMerges: Int): Seq[(String, String)] = {
    var v: Map[Vector[String], Long] = vocab.map { case (w, f) =>
      (w.split("").toVector :+ "</w>") -> f
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.length < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val (a, b) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        merges += ((a, b))
        v = v.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b) {
              acc.remove(acc.length - 1); acc += (a + b)
            } else acc += x
          }
          acc.toVector -> f
        }
      }
    }
    merges.toSeq
  }

  private val sennrich =
    Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("learnMerges matches the reference trainer on the Sennrich " +
      "vocabulary, merge for merge") {
    val vocabDf = sennrich.toSeq.toDF("word", "freq")
    val got = Bpe.learnMerges(vocabDf, 8)
    val want = referenceMerges(sennrich, 8)
    assert(got == want)
    // the classic first merges: (e,s) then (es,t) then (est,</w>)
    assert(got.take(3) == Seq("e" -> "s", "es" -> "t", "est" -> "</w>"))
  }

  test("learnMerges matches the reference on real corpus words and " +
      "stops when no pairs remain") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(80)
    val vocabDf = Bpe.vocab(docs, "text")
    val ref = vocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Bpe.learnMerges(vocabDf, 12) == referenceMerges(ref, 12))
    // a single-word vocab exhausts: "ab" has 3 symbols -> 2 merges
    val tiny = Seq(("ab", 1L)).toDF("word", "freq")
    assert(Bpe.learnMerges(tiny, 10).length == 2)
  }

  test("mergeOnce (column fold) and encodeUdf (per-row loop) agree, " +
      "and tokens concatenate back to the word") {
    val merges = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w")
    val words = Seq("lowest", "slowest", "wets", "x", "tttt")
      .toDF("word")
    val viaColumns = merges.foldLeft(
      words.withColumn("syms", Bpe.initialSymbols(col("word")))) {
      case (df, (a, b)) =>
        df.withColumn("syms", Bpe.mergeOnce(col("syms"), a, b))
    }
    val viaUdf = words.withColumn("syms",
      Bpe.encodeUdf(merges)(col("word")))
    assert(viaColumns.orderBy("word").collect().toSeq ==
      viaUdf.orderBy("word").collect().toSeq)
    // lossless: stripping the marker and concatenating restores the word
    viaUdf.collect().foreach { r =>
      val toks = r.getSeq[String](1)
      assert(toks.mkString("").stripSuffix("</w>") == r.getString(0))
    }
  }
}
