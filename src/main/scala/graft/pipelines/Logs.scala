package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The plugin-log analytics pipeline (reference
  * datasets/create_logs_dataset.ipynb): strip the free-text and
  * diagnostic columns from the log fact, enrich with the plugin
  * dimension, flag the BIM team, and split designers/bim toward their
  * sinks.
  *
  * The log fact is the scale axis (66k rows in one reference run;
  * unbounded in production) — it never shuffles here: the plugin dim
  * is broadcast, and flags/splits are narrow. The reference merges the
  * dim twice (cell 5, once per column pulled); one join carrying both
  * columns is plan-equivalent on the same key.
  */
object Logs {

  /** create_logs_dataset.ipynb cell 3 — free-text and version noise. */
  val defaultDrops: Seq[String] = Seq(
    "plugin_version", "username", "project_name", "message",
    "additional_message", "exception_message", "exception_stack_trace",
    "class_name", "program_name", "program_version")

  def transform(logs: DataFrame, plugins: DataFrame, bimUsers: Seq[String],
      dropCols: Seq[String] = defaultDrops): DataFrame = {
    val dim = broadcast(plugins.select(col("id").as("plugin_id"),
      col("display_name"), col("developer")))
    logs.drop(dropCols: _*)
      .join(dim, Seq("plugin_id"), "left")
      .withColumn("is_bim", col("user_display_name").isin(bimUsers: _*))
  }

  /** cell 9: one lazy plan, two flag-filtered sinks (bim, designers). */
  def split(transformed: DataFrame): (DataFrame, DataFrame) =
    (transformed.filter(col("is_bim")), transformed.filter(!col("is_bim")))
}
