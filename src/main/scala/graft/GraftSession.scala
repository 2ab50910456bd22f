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
      // v2 file-output committer: task commits rename straight into the
      // output dir, job commit is O(1) instead of moving every task's
      // dir again. Visibility/atomicity of a graft sink NEVER rides the
      // committer — the manifest publish is the transaction boundary
      // and half-staged batch dirs are reclaimed on failure — so v2's
      // weaker job-failure cleanup is immaterial here while every
      // staged commit saves the double rename (WriteProbe: 109 → 95 ms
      // per tiny staged file; scales with file count on real tables).
      // On an object store without atomic rename you would override
      // this with a store-native committer either way.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")

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
