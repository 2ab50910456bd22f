package graft

import org.apache.spark.sql.functions._

/** Dev tool (optimization round): steady-state latency of a tiny
  * action as a function of exchange count, with AQE on vs off — the
  * per-stage fixed cost every protocol action pays ~4× per action in
  * the bench's job traces. Numbers decide whether to chase stage
  * count or per-stage latency.
  */
object StageLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = (1 to 10000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    base.cache(); base.count()
    def plan(exchanges: Int) = exchanges match {
      case 0 => base.select(sum("v"))
      case 1 => base.groupBy("k").agg(sum("v").as("s")).select(sum("s"))
      case 2 => base.groupBy("k").agg(sum("v").as("s"))
        .groupBy((col("k") % 7).as("k2")).agg(sum("s").as("s2"))
        .select(sum("s2"))
      case _ => base.groupBy("k").agg(sum("v").as("s"))
        .groupBy((col("k") % 7).as("k2")).agg(sum("s").as("s2"))
        .groupBy((col("k2") % 3).as("k3")).agg(sum("s2").as("s3"))
        .select(sum("s3"))
    }
    def time(label: String, n: Int)(body: => Unit): Unit = {
      (1 to 3).foreach(_ => body) // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label: min=${ts.min}%.1f ms  med=${ts.sorted.apply(n / 2)}%.1f")
    }
    for (aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      for (e <- 0 to 3)
        time(s"aqe=$aqe exchanges=$e", 15) { plan(e).head(); () }
    }
    spark.conf.set("spark.sql.adaptive.enabled", true)
    spark.stop()
  }
}
