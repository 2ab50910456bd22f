package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

/** Exports the quality-model artifact: ridge-fits the weak-label rule
  * on a documents table (arg 0, default the sf0.01 harness dir) and
  * prints the weights to paste into `QualityModel.FrozenWeights`, plus
  * train-set agreement diagnostics for the frozen threshold.
  */
object TrainQuality {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val w = QualityModel.trainLogistic(docs)
    println("[train] weights = Seq(" + w.map(_.toString).mkString(", ") + ")")
    val f = QualityModel.featureFrame(docs)
      .withColumn("__y", QualityModel.weakLabel)
      .withColumn("__z", QualityModel.scoreFromFeatures(
        (0 until QualityModel.NumFeatures).map(i => col(s"__x$i")), w.toSeq))
    val row = f.agg(
      count(lit(1)).as("n"),
      sum(col("__y")).as("n_pos"),
      sum(when((col("__z") >= 0.0) === (col("__y") === 1.0), 1L).otherwise(0L))
        .as("n_agree")).head()
    val (n, nPos, nAgree) = (row.getLong(0), row.getDouble(1), row.getLong(2))
    println(f"[train] n=$n pos=${nPos.toLong} agree=$nAgree " +
      f"acc=${nAgree.toDouble / n}%.4f majority=${1.0 - nPos / n}%.4f")
  }
}
