package graft

import graft.pipelines.{Gitlab, Logs, Scripts}
import org.apache.spark.sql.functions._

/** The three dimension-enrichment reference pipelines (logs, scripts,
  * gitlab) over hand-built fixtures shaped like the reference's raw
  * exports.
  */
class RefPipelinesSpec extends SparkSpec {
  import spark.implicits._

  private val plugins = Seq(
    ("p1", "Stair Tool", "Ivanov", 1L, "long text", "link", "vlink", "spec"),
    ("p2", "Wall Check", "Petrova", 2L, "long text", "link", "vlink", "spec")
  ).toDF("id", "display_name", "developer", "development_stage_id",
    "long_description", "instruction_link", "video_link",
    "technical_specification")

  test("Logs: noise dropped, dim joined once, bim flag and split") {
    val logs = Seq(
      ("p1", "Анна", "1.0", "u", "proj", "m", "am", "em", "st", "cn", "pn", "pv"),
      ("p9", "Борис", "1.1", "u", "proj", "m", "am", "em", "st", "cn", "pn", "pv")
    ).toDF("plugin_id", "user_display_name", "plugin_version", "username",
      "project_name", "message", "additional_message", "exception_message",
      "exception_stack_trace", "class_name", "program_name", "program_version")
    val out = Logs.transform(logs, plugins, bimUsers = Seq("Анна"))
    assert(out.columns.toSet ==
      Set("plugin_id", "user_display_name", "display_name", "developer", "is_bim"))
    val rows = out.orderBy("plugin_id")
      .select("plugin_id", "display_name", "is_bim")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    // p9 has no dim row — left join keeps it with null name
    assert(rows.toSeq == Seq(("p1", "Stair Tool", true), ("p9", null, false)))
    val (bim, designers) = Logs.split(out)
    assert(bim.count() == 1 && designers.count() == 1)
  }

  test("Scripts: four-hop enrichment, LOC map lookup, fill, split") {
    val monitoring = Seq(
      ("p1", "Анна", "ABC_Tower_stage2", "1.0", "u", "pn", "pv"),
      ("p2", "Борис", "Solo", "1.0", "u", "pn", "pv")
    ).toDF("plugin_id", "user_display_name", "project_name",
      "plugin_version", "username", "program_name", "program_version")
    val stages = Seq((1L, "released"), (2L, "beta")).toDF("id", "description")
    val mapping = Seq(("p1", "41", "yg-1")).toDF("tim_guid", "gitlab_id", "yougile_guid")
    val gitlab = Seq((41L, "main", Map("C#" -> 1200L, "XAML" -> 300L)))
      .toDF("id", "chosen_branch", "loc_by_language")

    val out = Scripts.transform(monitoring, plugins, stages, mapping, gitlab,
      bimUsers = Seq("Анна"))
    val p1 = out.filter(col("plugin_id") === "p1").head()
    assert(p1.getAs[String]("short_project_name") == "ABC_Tower")
    assert(p1.getAs[String]("development_stage") == "released")
    assert(p1.getAs[String]("chosen_branch") == "main")
    assert(p1.getAs[Long]("loc_csharp") == 1200L)
    assert(p1.getAs[Boolean]("is_bim"))
    // p2 is unmapped: string fills, zero LOC, single-token short name
    val p2 = out.filter(col("plugin_id") === "p2").head()
    assert(p2.getAs[String]("short_project_name") == "Solo")
    assert(p2.getAs[String]("chosen_branch") == "Нет данных")
    assert(p2.getAs[Long]("loc_csharp") == 0L)
    assert(!out.columns.contains("project_name"))
    val (bim, designers) = Scripts.split(out)
    assert(bim.count() == 1 && designers.count() == 1)
  }

  test("Gitlab: unmapped revit plugins surface; enrichment resolves names") {
    val gitlab = Seq(
      (41L, "plugins/revit/StairTool"),
      (42L, "plugins/revit/NewThing"),
      (43L, "infra/terraform")
    ).toDF("id", "name")
    val mapping = Seq(("StairTool", 41L, "p1")).toDF("gitlab_name", "gitlab_id", "tim_guid")

    val unmapped = Gitlab.unmappedPlugins(gitlab, mapping).collect()
    assert(unmapped.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("NewThing", 42L)))

    val enriched = Gitlab.transform(gitlab, mapping, plugins)
      .orderBy("id").select("id", "display_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(enriched.toSeq ==
      Seq((41L, "Stair Tool"), (42L, null), (43L, null)))
  }
}
