package graft

/** Dev tool (optimization round): split a query's wall time into
  * DataFrame CONSTRUCTION (fixture driver work + Column tree
  * building), PLAN FORCE (analysis/optimization/physical planning via
  * queryExecution.executedPlan), and EXECUTION (the count action) —
  * attribution for queries whose JobProbe gaps have no matching
  * Catalyst phase (e.g. the PQ family's giant literal trees).
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[probe] master=${spark.sparkContext.master} dir=$dir")
    def drop(): Unit = {
      InternalCaches.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      args.foreach(n => try SparkEntry.queries(n)(spark, warm).count()
        catch { case _: Throwable => () })
    drop()
    for (rep <- 1 to 2; name <- args) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[$rep] $name%-24s construct=${(t1 - t0) / 1e9}%.2f s  plan=${(t2 - t1) / 1e9}%.2f s  exec=${(t3 - t2) / 1e9}%.2f s")
      drop()
    }
    spark.stop()
  }
}
