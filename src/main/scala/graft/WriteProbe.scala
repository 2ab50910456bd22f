package graft

/** Dev tool (optimization round): isolate the per-commit staging-write
  * latency — N tiny single-file parquet writes to fresh dirs, timed
  * individually after warmup, with and without the v2 file-output
  * committer — so a committer/config change is justified by a number,
  * not a hunch (guide §1).
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1)
    df.cache(); df.count()
    def run(label: String, n: Int): Unit = {
      val times = (1 to n).map { _ =>
        val dir = java.nio.file.Files.createTempDirectory("wp").toString
        val t0 = System.nanoTime()
        df.write.parquet(s"$dir/b")
        val dt = (System.nanoTime() - t0) / 1e6
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(dir))
        dt
      }
      println(f"$label: min=${times.min}%.1f ms  med=${times.sorted.apply(n / 2)}%.1f  max=${times.max}%.1f")
    }
    def runNoop(n: Int): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"noop write: min=${times.min}%.1f ms  med=${times.sorted.apply(n / 2)}%.1f  max=${times.max}%.1f")
    }
    run("warmup", 5)
    runNoop(20)
    run("committer v1 (default)", 20)
    spark.sparkContext.hadoopConfiguration.setInt(
      "mapreduce.fileoutputcommitter.algorithm.version", 2)
    run("committer v2", 20)
    spark.stop()
  }
}
