package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness-table loaders + the reference's source option sets.
  *
  * The reference ingests CSV (with BOM-prone Cyrillic headers), JSON
  * (arrays of nested records), and JDBC tables (see SURVEY.md §2.1,
  * S1-S4). The harness tables are parquet; the csv/json readers here
  * carry the exact option sets the reference's semantics need and are
  * exercised by round-trip tests.
  */
object Tables {

  val harnessTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one harness table from an sf directory.
    *
    * `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 has
    * no native type for — read it as epoch-nanos long and surface it
    * as a microsecond TimestampType (the sub-microsecond remainder is
    * dropped; queries must not emit raw `ts` values to the oracle
    * compare, only truncated/derived forms).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** S1: CSV scan — header, schema inference, UTF-8 (BOM handled by the
    * reader); reference site: datasets/create_logs_dataset.ipynb cell 1.
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("encoding", "UTF-8")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** S2: JSON scan of an array-of-records document; reference site:
    * datasets/create_scripts_dataset.ipynb cell 3 (json.load +
    * pd.json_normalize). Nested structs flatten via `col("a.*")`.
    */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S3/S4: JDBC scan with partitioned parallel read. The reference
    * streams whole Postgres tables via COPY (fetch_pluginsdb_*.py:19-28)
    * — on Spark the same is a partitioned JDBC read, no staging CSV.
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      dbtable: String,
      props: java.util.Properties,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L,
      upperBound: Long = Long.MaxValue): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
    val withPart = partitionColumn match {
      case Some(c) =>
        base.option("partitionColumn", c)
          .option("numPartitions", numPartitions)
          .option("lowerBound", lowerBound)
          .option("upperBound", upperBound)
      case None => base
    }
    props.stringPropertyNames().toArray(Array.empty[String]).foldLeft(withPart) {
      (b, k) => b.option(k, props.getProperty(k))
    }.load()
  }
}
