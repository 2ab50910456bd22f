package graft.pipelines

import graft.functions.Functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scripts-monitoring analytics pipeline (reference
  * datasets/create_scripts_dataset.ipynb): the monitoring fact
  * enriched through a four-hop dimension chain — development-stage
  * description into the plugin dim, plugin dim into the fact, the
  * plugin→gitlab/yougile mapping, then per-language LOC from the git
  * scan — with short-name derivation, BIM flag, dtype-driven null
  * fill, and the bim/designers split.
  *
  * Every dimension is broadcast (plugins, stages, mapping, and the
  * repo scan are all catalog-sized); the monitoring fact is the only
  * scale-growing side and crosses no shuffle. The reference's
  * `loc_by_language.C#` flattened-JSON columns become a proper
  * MapType lookup (`element_at`) — new languages appear as map keys,
  * not schema drift.
  */
object Scripts {

  /** cells 7: stage description joined in, heavy text columns dropped. */
  def enrichPlugins(plugins: DataFrame, stages: DataFrame): DataFrame =
    plugins.join(
      broadcast(stages.select(col("id").as("development_stage_id"),
        col("description").as("development_stage"))),
      Seq("development_stage_id"), "left")
      .drop("development_stage_id", "long_description", "instruction_link",
        "video_link", "technical_specification")

  /** @param monitoring fact (plugin_id, user_display_name,
    *                   project_name, … event columns)
    * @param gitlab     repo scan (id, chosen_branch,
    *                   loc_by_language map<string,long>)
    */
  def transform(monitoring: DataFrame, plugins: DataFrame,
      stages: DataFrame, mapping: DataFrame, gitlab: DataFrame,
      bimUsers: Seq[String]): DataFrame = {
    // cells 5-6: short name first (project_name is dropped with the noise)
    val fact = monitoring
      .withColumn("short_project_name", shortName(col("project_name")))
      .drop("plugin_version", "username", "program_name", "program_version",
        "project_name")
      .withColumn("is_bim", col("user_display_name").isin(bimUsers: _*))

    // cell 8: plugin dim (already stage-enriched) on plugin_id
    val dim = enrichPlugins(plugins, stages).withColumnRenamed("id", "plugin_id")
    val withPlugin = fact.join(broadcast(dim), Seq("plugin_id"), "left")

    // cell 9: both mapping columns in one hop (same key, one join)
    val map2 = mapping.select(col("tim_guid").as("plugin_id"),
      col("gitlab_id"), col("yougile_guid"))
    val mapped = withPlugin.join(broadcast(map2), Seq("plugin_id"), "left")

    // cell 10: lossy-key join — both sides coerced try_cast(long),
    // unparseable ids null out and simply don't match
    val repo = gitlab.select(tryLong(col("id")).as("__git_id"),
      col("chosen_branch"),
      element_at(col("loc_by_language"), "C#").as("loc_csharp"),
      element_at(col("loc_by_language"), "XAML").as("loc_xaml"))
    val withGit = mapped
      .withColumn("gitlab_id", tryLong(col("gitlab_id")))
      .join(broadcast(repo), col("gitlab_id") === col("__git_id"), "left")
      .drop("__git_id")

    fillByType(withGit) // cell 11: strings → "Нет данных", numerics → 0
  }

  /** cell 12: the bim/designers split. */
  def split(transformed: DataFrame): (DataFrame, DataFrame) =
    (transformed.filter(col("is_bim")), transformed.filter(!col("is_bim")))
}
