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
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Batch twin of `sessionize`: gap-based sessions via lag + running
    // sum of session breaks — one shuffle on user_id, two window passes
    // over it, then the per-session aggregate. This is the scalable
    // batch formulation (state never exceeds a partition sort), and it
    // puts the session math under the oracle gate. Gap compares
    // microsecond integers on both sides — no float/truncation drift.
    "q_sessionize_batch" -> graft.QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapMicros = 30L * 60 * 1000000
        graft.sources.Tables.table(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L).otherwise(0L))
          .withColumn("session_id", sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("total_value"),
            date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH g AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)),

    // The NATIVE operator for the same semantics: Spark's
    // session_window aggregation — one groupBy, no lag/running-sum
    // window pair, and the identical plan runs on a stream (it is the
    // streaming-native sessionizer). Boundary difference vs the lag
    // form: windows merge while gap < 30 min STRICTLY (an exactly-
    // 30-minute silence closes the session, where the lag form's `>`
    // keeps it), and the emitted end is last-event + gap, not
    // last-event — the oracle replays the `>=` rule and the +gap end.
    "q_sessionize_window" -> graft.QueryDef(
      (s, dir) => graft.sources.Tables.table(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start"),
      Some("""WITH g AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin))
  )

  /** events.parquet has shipped as INT64 TIMESTAMP(NANOS) (read as
    * long under nanosAsLong) and as native timestamp[us] (read as
    * TIMESTAMP_NTZ) across harness generations. A file stream needs
    * its schema up front, so build it around the ts dtype the files
    * actually carry (see [[readEvents]]).
    */
  def eventsFileSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** File-source stream over a directory of events parquet.
    *
    * Sniffs the ts encoding from a one-off batch footer read of the
    * directory (cheap: footers only), then declares the matching
    * stream schema and normalizes with the same type-adaptive rule as
    * the batch path (`Tables.normalizeEventsTs`) — so batch and
    * stream agree whatever format the harness regenerates next. An
    * EMPTY landing directory (stream started before the producer's
    * first write — the canonical file-source pattern) can't be
    * sniffed; it falls back to the current harness encoding
    * (timestamp[us] → TIMESTAMP_NTZ) instead of crashing at stream
    * definition time.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case _: org.apache.spark.sql.AnalysisException => TimestampNTZType
      }
    graft.sources.Tables.normalizeEventsTs(
      spark.readStream.schema(eventsFileSchema(tsType)).parquet(dir))
  }

  /** The 100 TB flavor of the K5 incremental sink (SURVEY §7.5 #7):
    * incremental ingest as a checkpointed Structured Streaming file
    * sink. Each Trigger.AvailableNow run processes exactly the source
    * files the checkpoint hasn't committed — restart-safe
    * exactly-once with no watermark column, no directory listing, and
    * none of the lexicographic-max pitfalls of hand-rolled
    * watermarks. Pair with a `readStream` source (e.g. readEvents);
    * the caller awaits the returned query.
    */
  def incrementalFileIngest(src: DataFrame, sinkDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    src.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Stream-static dimension enrichment — the Logs/Scripts broadcast
    * join in streaming form. The static side re-plans per micro-batch
    * (a file-backed dim refreshes between batches); the stream side
    * never shuffles.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join — the streaming twin of
    * the batch range-attribution (`q_range_attrib`): each click joins
    * the same user's views in the preceding `windowMinutes`. Both
    * sides carry watermarks and the join predicate bounds the time
    * range, so the symmetric hash join EVICTS state older than
    * watermark + window — state scales with the arrival horizon, not
    * the stream length. `views`/`clicks` must be separate source
    * streams (or branches the caller is confident Spark may re-read).
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", watermark)
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    c.join(v,
        col("c_user") === col("user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"),
        "inner")
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
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

  /** Streaming exact dedup: drop rows whose key reappears within the
    * watermark horizon. dropDuplicatesWithinWatermark expires a key's
    * state once the watermark passes it, so state is bounded by the
    * horizon's key cardinality — a plain dropDuplicates on a stream
    * accumulates every key forever. This is the streaming face of the
    * batch q_dedup_exact family: dedup an event feed by id on ingest,
    * or by content fingerprint for at-least-once upstream sources.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  // ---- gap-based sessionization with custom state --------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Epoch MICROSECONDS of a timestamp — the precision the batch twins
    * (`operators.Funnel`, `q_sessionize_batch`) chain and gap on via
    * unix_micros. Timestamp.getTime is millisecond-truncated, so two
    * events <1 ms apart would tie there and break the documented
    * batch/stream parity; all state-machine comparisons and sort keys
    * below use this instead.
    */
  private[graft] def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private[graft] def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** sessionStart/lastTs are epoch MICROSECONDS (see [[tsMicros]]). */
  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Int,
      totalValue: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Pure per-group fold: thread the incoming (sorted) events through
    * the open session, emitting closed sessions on each gap. Extracted
    * from the stateful operator so the gap logic is unit-testable.
    */
  def foldSessions(userId: Long, open: Option[SessionState],
      sorted: Seq[Event], gapMs: Long): (List[Session], Option[SessionState]) = {
    val gapUs = gapMs * 1000L
    var closed = List.empty[Session]
    var cur = open
    sorted.foreach { e =>
      val t = tsMicros(e.ts)
      cur match {
        case Some(s) if t - s.lastTs <= gapUs =>
          cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
            totalValue = s.totalValue + e.value))
        case Some(s) =>
          closed ::= Session(userId, microsToTs(s.sessionStart),
            microsToTs(s.lastTs), s.nEvents, s.totalValue)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    (closed.reverse, cur)
  }

  /** Per-user funnel progress: (stage index reached, epoch-MICROS ts
    * of that completion — micros so the strictly-after chain matches
    * the batch operator's unix_micros comparison exactly, see
    * [[tsMicros]]). One record per LIVE user — O(active users) state,
    * never O(events).
    */
  case class FunnelState(stage: Int, lastTs: Long)
  case class FunnelProgress(user_id: Long, stage_reached: Int)

  /** Advance a user's funnel state over ts-SORTED events: stage k
    * completes on the first stage-k event strictly after stage k−1's
    * completion (stage 0 on the first stage-0 event) — processing in
    * ts order makes the greedy advance pick exactly the min-ts chain
    * the batch operator (`operators.Funnel`) computes, which the
    * parity spec pins. Pure function, unit-testable without Spark.
    */
  def foldFunnel(state: Option[FunnelState], sorted: Seq[Event],
      stages: IndexedSeq[String]): Option[FunnelState] = {
    var cur = state
    sorted.foreach { e =>
      val stage = cur.map(_.stage).getOrElse(0)
      if (stage < stages.length && e.event_type == stages(stage) &&
          cur.forall(s => tsMicros(e.ts) > s.lastTs))
        cur = Some(FunnelState(stage + 1, tsMicros(e.ts)))
    }
    cur
  }

  /** Streaming twin of `operators.Funnel`: a per-user stage machine
    * in flatMapGroupsWithState. Emits one (user_id, stage_reached)
    * record per user per micro-batch THAT ADVANCES the user — the net
    * stage after the batch, not one row per intermediate hop (a user
    * whose view/click/purchase all land in one batch emits a single
    * stage-3 record); downstream funnels aggregate max(stage_reached)
    * per user, never count rows per stage.
    *
    * CONTRACT: events may arrive unordered WITHIN a micro-batch
    * (sorted here) but not across batches — a cross-batch straggler
    * older than the recorded stage time cannot rewind the machine.
    *
    * STATE LIFECYCLE: one record per user that ENTERED the funnel
    * (users whose events never match stage 0 store nothing). Eviction
    * is the DEFAULT — with ProcessingTimeTimeout a user inactive for
    * `idleTimeoutMs` is removed, bounding state by recently-active
    * funnel entrants; if such a user reappears the machine restarts
    * from stage 0 and late conversions undercount — the deliberate
    * memory/completeness trade on an unbounded stream, and the batch
    * operator over full history is the exact backfill for both this
    * and the straggler case. Pass NoTimeout for bounded runs
    * (AvailableNow) or when exact batch parity outweighs bounded
    * state. EventTimeTimeout is rejected: nothing here sets an
    * event-time timeout timestamp, so it would silently run with
    * unbounded state while looking configured for eviction.
    */
  def funnelProgress(events: DataFrame, stages: Seq[String],
      idleTimeoutMs: Long = 24L * 3600 * 1000,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout) = {
    import events.sparkSession.implicits._
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "funnelProgress supports ProcessingTimeTimeout or NoTimeout")
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update, timeout)(
        funnelHandler(stages.toIndexedSeq, idleTimeoutMs, useTimeout))
  }

  /** The per-group function behind [[funnelProgress]], factored out so
    * the timeout/eviction lifecycle is unit-testable with Spark's
    * TestGroupState (a wall-clock integration test of millisecond
    * timers cannot run deterministically).
    */
  private[graft] def funnelHandler(stages: IndexedSeq[String],
      idleTimeoutMs: Long, useTimeout: Boolean)(
      userId: Long, evts: Iterator[Event],
      state: GroupState[FunnelState]): Iterator[FunnelProgress] =
    if (useTimeout && state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val before = state.getOption
      val after = foldFunnel(before,
        evts.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id)), stages)
      after match {
        case Some(s) if !before.contains(s) =>
          state.update(s)
          if (useTimeout) state.setTimeoutDuration(idleTimeoutMs)
          Iterator(FunnelProgress(userId, s.stage))
        case Some(_) =>
          // no advance this batch, but the user is active — refresh
          // the eviction clock (keyed to last EVENT, not last advance;
          // this arm only matches when state already exists)
          if (useTimeout) state.setTimeoutDuration(idleTimeoutMs)
          Iterator.empty
        case None => Iterator.empty
      }
    }

  /** Sessions close after `gapMs` of user inactivity.
    * KeyValueGroupedDataset.flatMapGroupsWithState keeps one small
    * state record per live user — memory is O(active users), not
    * O(events). With the default ProcessingTimeTimeout the open
    * session flushes after the gap elapses in wall time; pass
    * NoTimeout for bounded runs (AvailableNow) where only gap-driven
    * closure should fire.
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout) = {
    import events.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeout) {
        (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) =>
          if (useTimeout && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, microsToTs(s.sessionStart),
              microsToTs(s.lastTs), s.nEvents, s.totalValue))
          } else {
            val sorted = events.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            val (closed, cur) = foldSessions(userId, state.getOption, sorted, gapMs)
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }

  // ---- streaming z-score twin (batch: q_outliers) -----------------

  /** Welford running moments for one group: count, mean, and M2 (sum
    * of squared deviations). 3 scalars per group — state is O(groups)
    * forever, never O(events); variance_pop = m2/n.
    */
  case class MomentState(n: Long, mean: Double, m2: Double) {
    def add(x: Double): MomentState = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      MomentState(n1, mean1, m2 + d * (x - mean1))
    }
  }
  case class GroupStats(event_type: String, n: Long, mu: Double, sd: Double)
  case class Anomaly(event_id: Long, event_type: String, value: Double,
      z: Double)

  /** Streaming twin of the batch z-score stats (`q_outliers`'s
    * aggregate side): per-group running mean/stddev via Welford's
    * update — numerically stable where a naive sum-of-squares
    * cancels catastrophically on large means. Update-mode output: one
    * refreshed stats row per group per micro-batch. The parity spec
    * pins the final state against batch avg/stddev_pop.
    */
  def runningStats(events: DataFrame): org.apache.spark.sql.Dataset[GroupStats] = {
    import events.sparkSession.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.event_type)
      .mapGroupsWithState[MomentState, GroupStats](
        GroupStateTimeout.NoTimeout) {
        (key: String, es: Iterator[Event], state: GroupState[MomentState]) =>
          val s = es.foldLeft(state.getOption.getOrElse(MomentState(0, 0, 0)))(
            (acc, e) => acc.add(e.value))
          state.update(s)
          GroupStats(key, s.n,
            s.mean, if (s.n > 0) math.sqrt(s.m2 / s.n) else 0.0)
      }
  }

  /** The SAME running stats on Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes mapGroupsWithState: named
    * state cells with their own encoders and TTLs, timers, and the
    * RocksDB state store (the provider the API requires; the parity
    * spec sets it for its query). The per-event arithmetic is
    * [[MomentState.add]] verbatim, so the two APIs provably compute
    * one thing — this twin exists to keep the engine on Spark's
    * current stateful-processing surface, not to change semantics.
    */
  class WelfordProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[String, Event, GroupStats] {
    @transient private var moments:
        org.apache.spark.sql.streaming.ValueState[MomentState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      moments = getHandle.getValueState[MomentState]("moments",
        org.apache.spark.sql.Encoders.product[MomentState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[GroupStats] = {
      val s0 = if (moments.exists()) moments.get() else MomentState(0, 0, 0)
      val s = rows.foldLeft(s0)((acc, e) => acc.add(e.value))
      moments.update(s)
      Iterator.single(GroupStats(key, s.n, s.mean,
        if (s.n > 0) math.sqrt(s.m2 / s.n) else 0.0))
    }
  }

  def runningStatsTws(events: DataFrame): org.apache.spark.sql.Dataset[GroupStats] = {
    import events.sparkSession.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.event_type)
      .transformWithState(new WelfordProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** In-stream anomaly detection: each event is scored against its
    * group's stats AS OF the previous events (prefix semantics — the
    * batch `q_outliers` scores against the full corpus instead, so
    * the contract here is "flag against what was known when the event
    * arrived", the only causal option on an unbounded stream). Events
    * are folded in (ts, event_id) order within a batch; emission
    * starts once the group has `minN` prior events. Pure fold in
    * [[foldAnomalies]], unit-tested without Spark.
    */
  def anomalies(events: DataFrame, threshold: Double = 3.0,
      minN: Long = 30): org.apache.spark.sql.Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, es: Iterator[Event], state: GroupState[MomentState]) =>
          val sorted = es.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
          val (out, s) = foldAnomalies(key,
            state.getOption.getOrElse(MomentState(0, 0, 0)), sorted,
            threshold, minN)
          state.update(s)
          out.iterator
      }
  }

  /** Score-then-update fold: an event never influences the stats it
    * is judged against.
    */
  def foldAnomalies(eventType: String, init: MomentState,
      sorted: Seq[Event], threshold: Double,
      minN: Long): (List[Anomaly], MomentState) = {
    var s = init
    var out = List.empty[Anomaly]
    sorted.foreach { e =>
      if (s.n >= minN) {
        val sd = math.sqrt(s.m2 / s.n)
        if (sd > 0) {
          val z = (e.value - s.mean) / sd
          if (math.abs(z) > threshold)
            out ::= Anomaly(e.event_id, eventType, e.value, z)
        }
      }
      s = s.add(e.value)
    }
    (out.reverse, s)
  }
}
