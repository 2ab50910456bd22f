package graft
import org.apache.spark.sql.functions._
/** Measured evidence for the round-17 weighted dyadic fold: time the
  * cells+signed-aggregate leg (noop sink, guide §1.4) in the OLD
  * per-row shape vs the NEW aggregate-then-explode shape, at sf0.01
  * and sf0.1 (10x the rows, same ~25-value heavy-hitter domain).
  */
object FoldScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("o_orderstatus"); val width = 2048; val depth = 3
    val levels = (0 to 56 by 8).reverse
    def base(dir: String) = graft.sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderstatus"),
        (col("o_custkey").bitwiseAND(-col("o_custkey"))).cast("long").as("__v"))
    def oldShape(dir: String) =
      levels.map(l => base(dir).select((keys.map(col) :+
          shiftright(col("__v"), l).as("__p") :+ lit(l).as("__lvl")): _*))
        .reduce(_ unionByName _)
        .withColumn("__d", explode(array((0 until depth).map(lit): _*)))
        .withColumn("__cell", pmod(xxhash64(col("__p"), col("__d")), lit(width.toLong)))
        .drop("__p")
        .groupBy((keys ++ Seq("__lvl", "__d", "__cell")).map(col): _*)
        .agg(count(lit(1)).as("__n"))
    def newShape(dir: String) =
      base(dir).groupBy((keys.map(col) :+ col("__v")): _*)
        .agg(count(lit(1)).as("__w"))
        .withColumn("__lvl", explode(array(levels.map(l => lit(l)): _*)))
        .withColumn("__p", expr("shiftright(__v, __lvl)"))
        .withColumn("__d", explode(array((0 until depth).map(lit): _*)))
        .withColumn("__cell", pmod(xxhash64(col("__p"), col("__d")), lit(width.toLong)))
        .drop("__v", "__p")
        .groupBy((keys ++ Seq("__lvl", "__d", "__cell")).map(col): _*)
        .agg(coalesce(sum(col("__w")), lit(0L)).as("__n"))
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      // warm once, then min of 3
      df.write.format("noop").mode("overwrite").save()
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val o = time(oldShape(dir)); val n = time(newShape(dir))
      println(f"[$sf] old=${o}%.3f s  new=${n}%.3f s  ratio=${n / o}%.2f")
    }
    // parity: identical cell state from both shapes at sf0.1
    val a = oldShape("/root/testdata/sf0.1").collect().map(_.toSeq).toSet
    val b = newShape("/root/testdata/sf0.1").collect().map(_.toSeq).toSet
    println(s"parity=${a == b} cells=${a.size}")
    spark.stop()
  }
}
