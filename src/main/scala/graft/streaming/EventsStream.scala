package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's incremental
  * patterns (SURVEY.md §2.8) plus true event-time semantics the
  * reference lacks: watermarked tumbling windows and gap-based
  * sessionization with custom state.
  */
object EventsStream {

  /** Batch twin of `windowedCounts` — same tumbling-window semantics
    * via the batch `window()` function, oracle-checkable in DuckDB
    * with date_trunc. Declared so the streaming operator's window
    * math is under the correctness gate.
    */
  def defs: Map[String, graft.QueryDef] = Map(
    "q_window_tumbling" -> graft.QueryDef(
      (s, dir) => graft.sources.Tables.table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))
  )

  /** events.parquet carries INT64 TIMESTAMP(NANOS) — declared as long
    * here (with nanosAsLong) and converted to a micros timestamp.
    */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsFileSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling-window counts per event type — the canonical
    * late-data-tolerant streaming aggregate. State is bounded by the
    * watermark horizon regardless of stream length.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  // ---- gap-based sessionization with custom state --------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Int,
      totalValue: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Sessions close after `gapMs` of user inactivity (processing-time
    * timeout drives emission). KeyValueGroupedDataset.mapGroupsWithState
    * keeps one small state record per live user — memory is O(active
    * users), not O(events).
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L) = {
    import events.sparkSession.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.sessionStart),
              new java.sql.Timestamp(s.lastTs), s.nEvents, s.totalValue))
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.sessionStart),
                    new java.sql.Timestamp(s.lastTs), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
