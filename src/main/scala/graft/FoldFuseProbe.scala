package graft
import org.apache.spark.sql.functions._

/** Measured evidence for the round-18 fused CDC fold: time the
  * merged-state leg (state + plus + minus → published state rows) in
  * the OLD three-exchange shape (per-side signed aggregates, union,
  * re-aggregate — what mergeCdcCore built through round 17) vs the
  * NEW single-aggregate contribution shape (mergedCdcState), noop
  * sink (guide §1.4), min of 3 after warmup, at sf0.01 and sf0.1
  * (10× the rows, same group domain). The shuffle carries the same
  * group partials either way (map-side partial aggregation); the old
  * shape pays two extra exchanges and their stage latency.
  */
object FoldFuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("o_orderstatus")
    val sums = Seq("o_totalprice")
    def base(dir: String) = graft.sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // the real fold's prior is a PARQUET STATE READ, not an aggregate
    // subplan — materialize it once per SF so the probe's plan matches
    // mergeCdcCore's (state scan ∪ batches)
    def prior(dir: String) = {
      val stateDir = java.nio.file.Files
        .createTempDirectory("foldfuse_state").toString
      base(dir).groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          sums.map(c => sum(col(c)).as(s"sum_$c")): _*)
        .write.mode("overwrite").parquet(stateDir)
      spark.read.parquet(stateDir)
    }
    def plus(dir: String) = base(dir).filter(col("o_orderkey") % 10 === 3)
    def minus(dir: String) = base(dir).filter(col("o_orderkey") % 10 === 7)
    def oldShapeWith(dir: String,
        st: org.apache.spark.sql.DataFrame) = {
      def signedAgg(df: org.apache.spark.sql.DataFrame, sign: Int) =
        df.groupBy(keys.map(col): _*).agg(
          (count(lit(1)) * sign).as("__n"),
          sums.map(c =>
            (coalesce(sum(col(c)), lit(0.0)) * sign).as(s"sum_$c")): _*)
      val delta = signedAgg(plus(dir), 1)
        .unionByName(signedAgg(minus(dir), -1))
      st.unionByName(delta)
        .groupBy(keys.map(col): _*).agg(
          sum("__n").as("__n"),
          sums.map(c => sum(s"sum_$c").as(s"sum_$c")): _*)
        .filter(col("__n") > 0)
    }
    def newShapeWith(dir: String,
        st: org.apache.spark.sql.DataFrame) =
      graft.operators.IncrementalAgg.mergedCdcState(
        Some(st), plus(dir), minus(dir), keys, sums, None)
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save()
      // stage-latency-scale timings: min of 7 to shake scheduler noise
      (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val st = prior(dir)
      val o = time(oldShapeWith(dir, st))
      val n = time(newShapeWith(dir, st))
      println(f"$sf: old(3-exchange)=${o}%.3f s  new(1-exchange)=${n}%.3f s  ratio=${n / o}%.2f")
    }
    spark.stop()
  }
}
