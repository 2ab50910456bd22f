package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared capabilities, each a Spark query + optional DuckDB
    * oracle. Area objects keep SURVEY.md §2's inventory navigable.
    */
  def registry: Map[String, QueryDef] =
    operators.Relational.defs ++ operators.Etl.defs ++
      operators.TextAnalysis.defs ++ operators.Dedup.defs ++
      operators.Similarity.defs ++ operators.Multimodal.defs ++
      operators.ArrayOps.defs ++ operators.Incremental.defs ++
      operators.AsOf.defs ++ operators.RangeJoin.defs ++
      operators.IncrementalAgg.defs ++ operators.Cdc.defs ++
      operators.BloomJoin.defs ++ operators.Funnel.defs ++
      operators.Sampling.defs ++ operators.Hygiene.defs ++
      operators.QualityModel.defs ++ operators.Packing.defs ++
      operators.Sketches.defs ++ operators.Skew.defs ++
      operators.Sharding.defs ++ operators.Bpe.defs ++
      operators.Audit.defs ++
      streaming.EventsStream.defs ++ pipelines.Corpus.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The projectsync-pipeline backbone (SURVEY.md §7.3): join + flag +
    * classification + aggregate in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    registry("q_join_snowflake").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
