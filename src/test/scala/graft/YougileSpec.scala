package graft

import graft.pipelines.Yougile
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Reference entry point 3 end-to-end: subtask removal, assignee
  * resolution with default, status/ISO derivations, sticker decode,
  * business-day cycle time.
  */
class YougileSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("task_id", StringType),
    StructField("title", StringType),
    StructField("assigned", ArrayType(StringType)),
    StructField("subtasks", ArrayType(StringType)),
    StructField("created_ms", LongType),
    StructField("completed_ms", LongType),
    StructField("stickers", StringType)))

  // Mon 2024-01-15 09:00 UTC → 14:00 +05; Tue 2024-01-16 07:00 UTC → 12:00 +05
  private val t0 = 1705309200000L
  private val t1 = 1705388400000L

  private val tasks = spark.createDataFrame(
    java.util.List.of(
      Row("t1", "Main task", Seq("u1", "u2"), Seq("t2"), t0, t1, """{"id": "s1"}"""),
      Row("t2", "Subtask", Seq("u1"), null, t0, null, """["s2", "s3"]"""),
      Row("t3", "Unassigned", Seq.empty[String], null, t0, null, "garbage")),
    schema)

  private val users = Seq(("u1", "Иванов"), ("u2", "Петров"))
    .toDF("user_id", "real_name")

  test("transform: the full task export derivation") {
    val out = Yougile.transform(tasks, users, holidayYears = (2024, 2024))
      .collect().map(r => r.getAs[String]("task_id") -> r).toMap

    // subtask t2 dropped
    assert(out.keySet == Set("t1", "t3"))

    val t1row = out("t1")
    assert(t1row.getAs[String]("assignees") == "Иванов, Петров")
    assert(t1row.getAs[String]("status") == "Закрыта")
    assert(t1row.getAs[String]("created_iso") == "2024-01-15T09:00:00Z")
    assert(t1row.getSeq[String](t1row.fieldIndex("sticker_ids")) == Seq("s1"))
    // local 14:00 Mon → 12:00 Tue: (17-14)/9 + (12-8)/9 = 0.3333+0.4444
    assert(t1row.getAs[Double]("work_days") == 0.78)

    val t3row = out("t3")
    assert(t3row.getAs[String]("assignees") == "Не назначен")
    assert(t3row.getAs[String]("status") == "В работе")
    assert(t3row.getSeq[String](t3row.fieldIndex("sticker_ids")).isEmpty)
    assert(t3row.isNullAt(t3row.fieldIndex("work_days")))
  }
}
