package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8: per-language LOC accounting over a checked-out file tree
  * (reference: extractors/fetch_gitlab_lines.py:78-160 — clone +
  * ls-tree + per-file line counting). The git/network half stays a
  * connector concern; the analytics half is a distributed text scan:
  * one task per file split, language from the extension, the
  * reference's counting rules as pushed-down filters.
  *
  * Rules (extractor_legacy/fetch_gitlab_lines.py:54-81):
  *  - blank lines don't count;
  *  - C#: lines that are just `{` or `}` don't count;
  *  - binary files (NUL in content) are skipped (F17 sniff).
  */
object RepoScan {

  def locByLanguage(spark: SparkSession, root: String): DataFrame =
    locLines(spark, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("loc"), countDistinct("path").as("n_files"))
      .orderBy(desc("loc"))

  /** Per-file LOC — the `(project, branch, lang, loc)` grain the
    * reference aggregates with argmax (A4).
    */
  def locByFile(spark: SparkSession, root: String): DataFrame =
    locLines(spark, root)
      .groupBy("path", "lang")
      .agg(count(lit(1)).as("loc"))

  private def locLines(spark: SparkSession, root: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true")
      .text(root)
      .select(input_file_name().as("path"), col("value"))
      .withColumn("lang",
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
      .filter(col("lang") =!= "")
      .filter(!col("value").contains("\u0000")) // F17 binary sniff
      .filter(length(trim(col("value"))) > 0)
      .filter(!(col("lang") === "cs" && trim(col("value")).isin("{", "}")))
}
