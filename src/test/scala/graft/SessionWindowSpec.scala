package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Spark's native `session_window` vs the engine's gap sessionization
  * (`q_sessionize_batch` / `EventsStream.sessionize`): the grouping
  * agrees everywhere, INCLUDING the exact-gap boundary (both split
  * only strictly past the gap) — pinned here so a Spark upgrade or a
  * local refactor that shifts either boundary fails loudly.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val gapUs = 30L * 60 * 1000000

  private def lagSessions(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select("user_id", "n", "v")
  }

  private def nativeSessions(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select("user_id", "n", "v")

  test("native session_window groups exactly like the lag-based twin " +
      "away from the boundary") {
    // gaps of 1..29 min (same session) and 31..59 min (split) — never
    // exactly 30; multiple users, interleaved arrival
    val rows = for (u <- 1L to 6L; i <- 0 until 10) yield {
      val gapMin = if (i == 0) 0 else (u * 7 + i * 13) % 59 + 1
      (u * 100 + i, u, i, gapMin)
    }
    var cur = Map.empty[Long, Long] // user -> running minutes
    val evs = rows.map { case (id, u, i, gapMin) =>
      val at = cur.getOrElse(u, 0L) + (if (gapMin == 30) 31 else gapMin)
      cur += u -> at
      (id, new Timestamp(ts("2024-03-01 00:00:00").getTime + at * 60000),
        u, "e", (id % 7).toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = lagSessions(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val b = nativeSessions(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(a == b)
  }

  test("exact-gap boundary: both semantics keep the session (split " +
      "only strictly past the gap)") {
    val atGap = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "e", 1.0),
      (2L, ts("2024-03-01 10:30:00"), 1L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // diff == gap -> ONE session in both (session_window's close is
    // inclusive of lastTs+gap, same as our `> gap` split contract)
    assert(lagSessions(atGap).collect().map(_.getLong(1)).toSeq == Seq(2L))
    assert(nativeSessions(atGap).collect().map(_.getLong(1)).toSeq == Seq(2L))
    val pastGap = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "e", 1.0),
      (2L, ts("2024-03-01 10:30:00.000001"), 1L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(lagSessions(pastGap).collect().map(_.getLong(1)).sorted.toSeq
      == Seq(1L, 1L))
    assert(nativeSessions(pastGap).collect().map(_.getLong(1)).sorted.toSeq
      == Seq(1L, 1L))
  }
}
