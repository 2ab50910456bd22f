package graft.pipelines

import graft.functions.Functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The gitlab-repo analytics pipeline (reference
  * datasets/create_gitlab_dataset.ipynb): detect repos under
  * `plugins/revit/` that the mapping sheet doesn't know yet (the K6
  * writeback feed — cells 5-6), then enrich every scanned repo with
  * its plugin display name and developer through the mapping (cell 7).
  *
  * The unmapped set is a prefix filter + left-anti join — the filter
  * pushes to the scan, the anti join broadcasts the known-name list.
  * The writeback itself goes through sources.Sinks.writebackUnmapped,
  * which forces the action ordering the reference gets for free from
  * eager pandas.
  */
object Gitlab {

  /** cells 5: repos under the plugin prefix whose short name the
    * mapping doesn't list — exact, case-sensitive membership, like the
    * reference. Returns (gitlab_name, gitlab_id) ready for writeback.
    */
  def unmappedPlugins(gitlab: DataFrame, mapping: DataFrame): DataFrame =
    gitlab.filter(col("name").startsWith("plugins/revit/"))
      .withColumn("plugin_name", stripPrefix(col("name"), "plugins/revit/"))
      .join(broadcast(mapping.select(col("gitlab_name").as("plugin_name"))),
        Seq("plugin_name"), "left_anti")
      .select(col("plugin_name").as("gitlab_name"), col("id").as("gitlab_id"))

  /** cell 7: repo scan ⟕ mapping ⟕ plugin dim (name + developer in one
    * hop — the reference does two merges on the same key).
    */
  def transform(gitlab: DataFrame, mapping: DataFrame,
      plugins: DataFrame): DataFrame = {
    val viaMapping = gitlab.join(
      broadcast(mapping.select(col("gitlab_id").as("id"), col("tim_guid"))),
      Seq("id"), "left")
    viaMapping.join(
      broadcast(plugins.select(col("id").as("tim_guid"),
        col("display_name"), col("developer"))),
      Seq("tim_guid"), "left")
  }
}
