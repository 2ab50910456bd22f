package graft

/** Local timing probe: run the named queries (all, if none given)
  * against PROBE_DIR (default sf0.1) with the Bench session + cache
  * hygiene, print per-query seconds for two interleaved sweeps.
  * Fast single-operator perf iteration without a full bench run.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // numbers are only comparable to BENCH_r*.json when the core count
    // matches the driver's SPARK_GRAFT_CPUS=32 — print the session
    // shape so a local[4] probe can't masquerade as a 4x regression
    // (a CPU-bound stage like the editdist DP scales ~linearly here)
    println(s"[probe] master=${spark.sparkContext.master} dir=$dir")
    val sel = if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    def drop(): Unit = {
      // drain first so the tracked-cache bin empties instead of holding
      // references across the whole run; the sweep then catches any
      // untracked leftovers
      InternalCaches.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // untimed warmup at the smallest SF (codegen/JIT, parquet footers)
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      sel.values.foreach(fn => try fn(spark, warm).count()
        catch { case _: Throwable => () })
    drop()
    for (sweep <- 1 to 2) {
      sel.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = try fn(spark, dir).count() catch { case _: Throwable => -1L }
        println(f"[$sweep] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
        drop()
      }
    }
    spark.stop()
  }
}
