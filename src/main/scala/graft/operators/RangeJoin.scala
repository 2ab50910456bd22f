package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed into an equi-join. Spark
  * turns `l.key = r.key AND t BETWEEN start AND end` into an equi-join
  * on key with the range as a post-filter — fine until one key holds
  * many rows, at which point the per-key cross product explodes.
  * Bucketing makes the blowup bounded and tunable instead:
  *
  *   point  → one row   at (keys, floor(t/w))
  *   interval → one row per covered bucket (keys, floor(start/w) …
  *              floor(end/w)) — (span/w)+1 rows
  *   equi-join on (keys, bucket), then verify exact containment.
  *
  * Join traffic is |P| + |I|·(span/w+1) rows through one hash
  * shuffle, and each candidate pair is key-AND-time-colocated —
  * pick w ≈ typical span so intervals replicate ~2×. A point's single
  * bucket meets each interval at most once, so no dedup pass is
  * needed.
  */
object RangeJoin {

  /** @param leftOpen when true the containment is (start, end] —
    *                 attribution-window convention; else [start, end].
    * Point/interval payload columns must not collide (besides keys).
    */
  def rangeJoin(points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keys: Seq[String], bucketMicros: Long, leftOpen: Boolean = false): DataFrame = {
    val w = lit(bucketMicros)
    val p = points.withColumn("__b",
      floor(unix_micros(col(pointTime)) / w).cast("long"))
    val i = intervals.withColumn("__b", explode(sequence(
      floor(unix_micros(col(startCol)) / w).cast("long"),
      floor(unix_micros(col(endCol)) / w).cast("long"))))
    val contained =
      if (leftOpen) col(pointTime) > col(startCol) && col(pointTime) <= col(endCol)
      else col(pointTime).between(col(startCol), col(endCol))
    p.join(i, keys :+ "__b").filter(contained).drop("__b")
  }

  def defs: Map[String, QueryDef] = Map(
    // Attribution: clicks inside each purchase's preceding 30-minute
    // window, per user. Bucket width = window width → each interval
    // lands in ≤ 2 buckets. Purchases with no window clicks drop out
    // (inner semantics) — the oracle does the same.
    "q_range_attrib" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("value").as("click_value"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("w_end"))
          .withColumn("w_start", col("w_end") - expr("INTERVAL 30 MINUTES"))
        rangeJoin(clicks, "click_ts", purchases, "w_start", "w_end",
            Seq("user_id"), bucketMicros = 30L * 60 * 1000000, leftOpen = true)
          .groupBy("purchase_id")
          .agg(count(lit(1)).as("n_clicks"),
            round(sum("click_value"), 2).as("clicked_value"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, count(*) AS n_clicks,
        |  round(sum(c.value), 2) AS clicked_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts > p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |GROUP BY 1 ORDER BY purchase_id""".stripMargin))
  )
}
