package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    // untimed warmup: session init, the codegen compiler, JIT of the
    // interpreted-HOF eval paths, parquet footer reads. Each query
    // runs once at the smallest SF first — measured swings of ±40% on
    // the first execution of a plan shape otherwise land on whichever
    // query happens to run it first. Falls back to a scalar query if
    // the small SF isn't present.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.values.foreach(fn =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () })
    else
      SparkEntry.queries.get("q_max_scalar").foreach(_(spark, sfDir).count())
    // drop leftover persists/checkpoints between queries: operator
    // persists (shingle frames, label-propagation checkpoints) are
    // scoped to their query and would otherwise accumulate cache
    // pressure across the 60+-query run
    def dropCaches(): Unit = {
      // clearCache unpersists AND deregisters InMemoryRelations (an
      // RDD-level unpersist would leave the CacheManager entry, and a
      // later query with a matching plan fragment would silently pay
      // re-materialization inside its timed window); the RDD sweep
      // catches localCheckpoint RDDs, which the catalog doesn't track
      // drain first so the tracked-cache bin empties instead of holding
      // references across the whole run; the sweep then catches any
      // untracked leftovers
      InternalCaches.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    dropCaches()
    // best-of-2 per query with INTERLEAVED repetitions: the full query
    // list runs once, then runs again, and each query keeps its min.
    // Back-to-back repetitions of the same query sit inside one ~2 s
    // window, so a single multi-minute load spike on the shared box
    // poisons BOTH samples (the round-3 4-query noise window);
    // separating the two samples by the whole ~30 s sweep makes the
    // min robust to any spike shorter than a sweep.
    // A query that throws records an ERROR, not a timing: round 7's
    // 19 analysis-crashed queries showed up as 0.05-0.07 s "speedups"
    // because elapsed-to-exception was written into the timing map.
    // Failures now land in a separate errors map and force rc=1, so a
    // broken query can never masquerade as a fast one.
    def sweep(): (Map[String, Double], Map[String, String]) = {
      val times = Map.newBuilder[String, Double]
      val errs = Map.newBuilder[String, String]
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times += name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            errs += name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}"
        }
        dropCaches()
      }
      (times.result(), errs.result())
    }
    val (t1, e1) = sweep()
    val (t2, e2) = sweep()
    // a query succeeds only if BOTH sweeps succeeded; a one-sweep flake
    // is still an error (its single sample is not best-of-2 comparable)
    val results = SparkEntry.queries.keys
      .filter(k => t1.contains(k) && t2.contains(k))
      .map(k => k -> math.min(t1(k), t2(k))).toMap
    val errors = (e1 ++ e2)
    // full JSON string escape incl. control chars — exception messages
    // carry tabs/newlines, and one unescaped control char would void
    // the driver's json.load of the whole bench line (same rule as
    // Verify's oracle_sql dump)
    def jsonStr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => jsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    println(line)
    // ALSO land the summary at a stable path: round 8's driver lost 91
    // of 156 per-query timings because only a truncated stdout tail
    // survived the handoff ("parsed": null in BENCH_r08.json). The file
    // is the durable copy; stdout stays the driver contract.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_summary.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench_summary write failed: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
