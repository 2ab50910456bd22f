/** Dev tool: print the formatted physical plan of named queries so
  * pushdown / broadcast / codegen spans can be inspected.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      println(s"========== $name ==========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
