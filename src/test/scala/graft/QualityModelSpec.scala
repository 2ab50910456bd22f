package graft

import graft.operators.QualityModel
import graft.pipelines.Corpus
import org.apache.spark.sql.functions._

/** The trained quality classifier: IRLS training reproduces the frozen
  * artifact, the frozen scorer fits its weak label, an MLlib logistic
  * fit on the same features agrees with it, and the Corpus gate wires
  * it in.
  */
class QualityModelSpec extends SparkSpec {

  private val trainDir = "/root/testdata/sf0.01"
  private lazy val docs = graft.sources.Tables.table(spark, trainDir, "documents")

  private lazy val scored = QualityModel.featureFrame(docs)
    .withColumn("__y", QualityModel.weakLabel)
    .withColumn("__z", QualityModel.scoreFromFeatures(
      (0 until QualityModel.NumFeatures).map(i => col(s"__x$i"))))

  test("refit on the training table reproduces FrozenWeights") {
    val w = QualityModel.trainLogistic(docs)
    val diffs = w.zip(QualityModel.FrozenWeights).map { case (a, b) =>
      math.abs(a - b) / math.max(1.0, math.abs(b))
    }
    // fp-sum order differs between the export run (local[32]) and the
    // test session (local[4]); Newton's fixed point keeps that at noise
    assert(diffs.max < 1e-6, s"weights drifted: ${w.toSeq}")
  }

  test("frozen scorer classifies the weak label at >= 98% (majority is 79%)") {
    val row = scored.agg(
      count(lit(1)).as("n"),
      sum(when((col("__z") >= 0.0) === (col("__y") === 1.0), 1L)
        .otherwise(0L)).as("agree")).head()
    assert(row.getLong(1).toDouble / row.getLong(0) >= 0.98)
  }

  test("MLlib logistic fit on the same features agrees with the scorer") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    // x1..x13 (MLlib fits its own intercept in place of x0)
    val featCols = (1 until QualityModel.NumFeatures).map(i => s"__x$i")
    val assembled = new VectorAssembler()
      .setInputCols(featCols.toArray).setOutputCol("features")
      .transform(scored.withColumn("label", col("__y")))
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(1e-4).setStandardization(false)
      .fit(assembled)
    val agree = model.transform(assembled)
      .withColumn("ours", when(col("__z") >= 0.0, 1.0).otherwise(0.0))
      .agg(avg(when(col("prediction") === col("ours"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(agree >= 0.97, s"MLlib/IRLS agreement $agree")
  }

  test("Corpus.qualityFilter applies the model gate when configured") {
    val cfg = Corpus.Config(minTokens = 1, maxPunctRatio = 1.0,
      minModelScore = Some(0.5))
    val kept = Corpus.qualityFilter(docs, cfg).count()
    val expected = scored.filter(col("__z") >= 0.0).count()
    assert(kept == expected && kept > 0 && kept < docs.count())
  }

  test("calibration buckets partition the corpus; counts reconcile") {
    val rows = SparkEntry.registry("q_quality_calibration").fn(spark, sfDir)
      .collect()
    val total = graft.sources.Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total, "buckets must partition")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    rows.foreach { r =>
      val (n, pos, rate, pred) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(pos <= n)
      assert(rate == math.rint(pos.toDouble / n * 10000) / 10000)
      // the mean prediction must sit inside its own bucket's range
      // (up to the 1e-4 display rounding at the edges)
      val b = r.getLong(0)
      assert(pred >= b / 10.0 - 1e-4)
      assert(b == 9L || pred <= (b + 1) / 10.0 + 1e-4)
    }
  }
}
