object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"TIMING $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
