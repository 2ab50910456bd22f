package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the latest right row at
  * or before its timestamp within the same key group. Spark has no
  * native as-of join; the scalable formulation is union + window
  * rather than a per-key loop or an inequality theta-join:
  *
  *   tag rows, union both sides, hash-partition by key, sort by
  *   (time, right-before-left), carry the last right payload forward
  *   with last(ignoreNulls) over an unbounded-preceding frame, keep
  *   left rows.
  *
  * Cost is ONE shuffle of |L|+|R| rows plus a partition-local sort —
  * the same work a dedicated merge-join ASOF operator does, and it
  * inherits AQE skew splitting on the key partition for free. An
  * inequality join (`l.key = r.key AND r.t <= l.t` + argmax) would
  * explode to |matches| intermediate rows; a range-bucketed variant
  * only wins when one side is tiny — this one is shape-robust.
  */
object AsOf {

  /** @param keys      equality-join key columns (both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @return left columns unchanged, plus every non-key right column
    *         (its time included) prefixed with `asof_`; unmatched left
    *         rows keep nulls (left-join semantics)
    *
    * SQL join-key null semantics: a window partition would happily
    * group null keys together and "match" them, but `l.key = r.key`
    * (and `l.t >= r.t`) is never true on NULL — so null-key/null-time
    * right rows are dropped and null-key/null-time left rows bypass
    * the window entirely, emitted unmatched. The bypass is a second
    * pushdown-narrowed scan of `left` only.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, prefix: String = "asof_"): DataFrame = {
    val lPayload = left.columns.filterNot(keys.contains)
    val rPayload = right.columns.filterNot(keys.contains)
    val lValid = (keys :+ leftTime).map(col(_).isNotNull).reduce(_ && _)
    val rValid = (keys :+ rightTime).map(col(_).isNotNull).reduce(_ && _)
    val rPacked = right.filter(rValid).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(1).as("__r"),
        struct(rPayload.map(col): _*).as("__rp")): _*)
    val rStructType = rPacked.schema("__rp").dataType
    val lPacked = left.filter(lValid).select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(0).as("__r"),
        lit(null).cast(rStructType).as("__rp"),
        struct(lPayload.map(col): _*).as("__lp")): _*)
    val unioned = rPacked
      .withColumn("__lp", lit(null).cast(lPacked.schema("__lp").dataType))
      .unionByName(lPacked)
    // at equal times the right row sorts first (__r desc), so a right
    // row AT the left timestamp matches — ASOF's >= convention
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last("__rp", ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
      .select(
        keys.map(col) ++
          lPayload.map(c => col(s"__lp.$c").as(c)) ++
          rPayload.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
    val passthrough = left.filter(!lValid)
      .select(
        keys.map(col) ++
          lPayload.map(col) ++
          rPayload.map(c =>
            lit(null).cast(right.schema(c).dataType).as(s"$prefix$c")): _*)
    matched.unionByName(passthrough)
  }

  def defs: Map[String, QueryDef] = Map(
    // Each purchase matched to the user's latest click at-or-before it
    // (left semantics: early purchases with no prior click keep nulls).
    // DuckDB's native ASOF LEFT JOIN is the oracle. Lag is an integer
    // second division on both sides — no float drift.
    "q_asof_join" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id", "value")
        val clicks = e.filter(col("event_type") === "click")
          .select("user_id", "ts", "value")
        asofJoinBackward(purchases, clicks, Seq("user_id"), "ts", "ts")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            round(col("asof_value"), 2).as("click_value"),
            // non-negative by construction, so truncation == floor (//)
            ((unix_micros(col("ts")) - unix_micros(col("asof_ts")))
              / lit(1000000L)).cast("long").as("lag_s"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  round(c.value, 2) AS click_value,
        |  (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000 AS lag_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin))
  )
}
