package graft.pipelines

import graft.functions.Functions._
import graft.functions.Workdays
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The task-tracker export pipeline (reference entry point 3,
  * SURVEY.md §3.3: fetch_yougile_programming.py): drop subtasks,
  * resolve assignee names against the user dimension, derive status
  * from the completion timestamp, convert epoch-ms fields, decode the
  * polymorphic sticker payload, and compute the business-day cycle
  * time. One lazy plan; the only wide ops are the subtask anti-join
  * and the assignee explode/re-aggregate (J12).
  */
object Yougile {

  /** @param tasks (task_id, title, assigned array<string>,
    *               created_ms, completed_ms nullable, stickers json)
    * @param users  (user_id, real_name) dimension
    */
  def transform(tasks: DataFrame, users: DataFrame,
      holidayYears: (Int, Int) = (2020, 2026)): DataFrame = {
    // P11: a subtask is any id appearing in some other task's subtasks
    val subtaskIds = tasks
      .select(explode(coalesce(col("subtasks"),
        array().cast(ArrayType(StringType)))).as("task_id"))
      .distinct()
    val top = tasks.join(subtaskIds, Seq("task_id"), "left_anti")

    // J12: explode assigned → broadcast user join → sorted rejoin
    val resolved = top
      .select(col("task_id"), explode_outer(col("assigned")).as("user_id"))
      .join(broadcast(users), Seq("user_id"), "left")
      .groupBy("task_id")
      .agg(concat_ws(", ", array_sort(collect_list(
        coalesce(col("real_name"), col("user_id"))))).as("assignees"))

    val created = timestamp_millis(col("created_ms"))
    val completed = timestamp_millis(col("completed_ms"))
    top.join(resolved, Seq("task_id"), "left")
      .withColumn("assignees",
        when(col("assignees").isNull || col("assignees") === "", "Не назначен")
          .otherwise(col("assignees")))
      .withColumn("status",
        when(col("completed_ms").isNotNull, "Закрыта").otherwise("В работе"))
      .withColumn("created_iso",
        date_format(created, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("completed_iso",
        date_format(completed, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("sticker_ids", normalizeDictOrList(col("stickers")))
      .withColumn("work_days",
        Workdays.workdaysDiff(
          toLocal(created), toLocal(completed),
          Workdays.ruHolidayColumn(holidayYears._1, holidayYears._2)))
      .drop("assigned", "subtasks", "stickers", "created_ms", "completed_ms")
  }
}
