package graft

/** Plan inspection helper: `runMain graft.PlanDump <sfDir> <query>...`
  * prints each named query's formatted physical plan — the loop behind
  * "explain, then iterate until it's the plan you'd want". Kept as a
  * main (not a test) so it can aim at any SF directory.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
      InternalCaches.drain()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
