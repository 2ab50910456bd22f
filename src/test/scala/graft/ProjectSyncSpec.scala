package graft

import graft.pipelines.ProjectSync
import graft.pipelines.ProjectSync.{Classifier, Config}
import org.apache.spark.sql.functions._

/** The §7.3 end-to-end slice: join + flags + ordered classification +
  * null fill + split, against a golden hand-checked output.
  */
class ProjectSyncSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Config(
    userCol = "user_display_name",
    bimUsers = Seq("Иванов Иван"),
    objectClassifier = Classifier("project_name",
      Seq("атом" -> "АЭС", "ику" -> "ИКУ"), "Неизвестные проекты"))

  private val ad = Seq(("Иванов Иван", "ivanov"), ("Петров Петр", "petrov"))
    .toDF("display_name", "login")

  private val sync = Seq(
    ("АТОМ-1_корпус_Иванов Иван", "Иванов Иван"),
    ("ИКУ_долина (отсоединено)", "Петров Петр"),
    ("прочее_здание", "Петров Петр"),
    ("безымянный", null)
  ).toDF("project_name", "user_display_name")

  test("transform: join + flags + first-match classification + null fill") {
    val out = ProjectSync.transform(sync, ad, cfg)
      .select("project_name", "login", "is_bim", "object_name",
        "is_detached", "short_project_name")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2),
        r.getString(3), r.getInt(4), r.getString(5)))).toMap
    assert(out("АТОМ-1_корпус_Иванов Иван") ==
      (("ivanov", true, "АЭС", 0, "АТОМ-1_корпус")))
    assert(out("ИКУ_долина (отсоединено)") ==
      (("petrov", false, "ИКУ", 1, "ИКУ_долина (отсоединено)")))
    assert(out("прочее_здание") ==
      (("petrov", false, "Неизвестные проекты", 0, "прочее_здание")))
    // unmatched user: null login canonicalized by fillByType
    assert(out("безымянный") ==
      (("Нет данных", false, "Неизвестные проекты", 0, "безымянный")))
  }

  test("split: bim/designers partitions exclude detached rows") {
    val (bim, designers) = ProjectSync.split(ProjectSync.transform(sync, ad, cfg))
    assert(bim.select("project_name").as[String].collect().toSeq ==
      Seq("АТОМ-1_корпус_Иванов Иван"))
    val d = designers.select("project_name").as[String].collect().toSet
    assert(d == Set("прочее_здание", "безымянный")) // detached row dropped
  }

  test("the whole transform is one narrow stage over a broadcast join (no shuffle)") {
    val plan = ProjectSync.transform(sync, ad, cfg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    // derivations must not introduce an exchange before any sink
    assert(!plan.split("BroadcastHashJoin").head.contains("Exchange"))
  }
}
