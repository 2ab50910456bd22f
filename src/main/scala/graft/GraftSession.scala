package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 128 GiB box) but every setting is cluster-safe: shuffle partitions
  * follow parallelism, AQE handles runtime coalescing / skew joins, and
  * the session timezone is pinned to UTC so timestamp semantics match
  * the DuckDB oracle regardless of host TZ.
  */
object GraftSession {

  def builder(master: String = s"local[${defaultCpus}]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // engine extensions: native SQL functions + the HOF-dot-product
      // optimizer rewrite (graft.plans.RewriteHofDotProduct)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", defaultCpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Parquet scans: pushdown + vectorized read are on by default; be
      // explicit since the whole correctness/bench harness rides on them.
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.enableVectorizedReader", "true")

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SQL-callable kit (scalar macros + native functions) ships with
    // every session; CREATE OR REPLACE makes this idempotent.
    functions.SqlMacros.install(spark)
    spark
  }
}
