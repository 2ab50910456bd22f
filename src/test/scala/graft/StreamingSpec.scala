package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp
import org.apache.spark.api.java.Optional

/** Structured-streaming operators: watermarked tumbling windows match
  * the batch twin; gap sessionization closes sessions on gaps.
  *
  * Both queries run with Trigger.AvailableNow — process exactly the
  * staged data, then stop. A default (continuous micro-batch) trigger
  * with a processing-time timeout would spin empty batches forever.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts over a memory stream matches the batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    mem.addData(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:55:00"), 1L, "click", 2.0),
      (3L, ts("2024-01-01 11:05:00"), 2L, "view", 4.0))
    val query = EventsStream.windowedCounts(events).writeStream
      .format("memory").queryName("wc").outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(query.awaitTermination(120000), "stream did not finish in 120s")
      val got = spark.table("wc")
        .select("window_start", "event_type", "n", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 4.0)))
    } finally query.stop()
  }

  test("native session_window: batch partition agrees with the lag form; " +
      "the SAME aggregation runs on a stream") {
    // batch: q_sessionize_window groups the identical sessions as the
    // lag-window q_sessionize_batch wherever no inter-event gap is
    // exactly 30:00.000000 (microsecond timestamps: none in harness
    // data) — compare the per-user session-size multisets
    val sw = SparkEntry.registry("q_sessionize_window").fn(spark, sfDir)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val sb = SparkEntry.registry("q_sessionize_batch").fn(spark, sfDir)
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sw == sb)
    // streaming: the NATIVE operator's selling point — the same
    // session_window aggregation over an unbounded source
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0), // same session
      (3L, ts("2024-01-01 11:30:00"), 1L, "click", 4.0)) // new session
    val query = events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("swq")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(query.awaitTermination(120000), "stream did not finish in 120s")
      val got = spark.table("swq").select("user_id", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq((1L, 1L), (1L, 2L)))
    } finally query.stop()
  }

  test("stream-stream interval join: clicks attach to prior views across " +
      "micro-batches; result equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val views = vMem.toDF().toDF("event_id", "ts", "user_id")
    val clicks = cMem.toDF().toDF("event_id", "ts", "user_id")
    val query = EventsStream.attributeClicks(views, clicks, windowMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val allViews = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L),
      (11L, ts("2024-01-01 11:00:00"), 1L),
      (12L, ts("2024-01-01 10:00:00"), 2L))
    val allClicks = Seq(
      (20L, ts("2024-01-01 10:10:00"), 1L), // in-window, same batch
      (21L, ts("2024-01-01 11:20:00"), 1L), // in-window of view 11, LATER batch
      (22L, ts("2024-01-01 12:30:00"), 1L), // outside every window
      (23L, ts("2024-01-01 10:29:00"), 2L), // in-window, other user
      (24L, ts("2024-01-01 10:10:00"), 3L)) // user with no view
    try {
      vMem.addData(allViews: _*)
      cMem.addData(allClicks.take(1): _*)
      query.processAllAvailable()
      // the cross-batch click joins a view whose state must have survived
      cMem.addData(allClicks.drop(1): _*)
      query.processAllAvailable()
      val got = spark.table("attrib")
        .select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (vid, vts, vu) <- allViews
        (cid, cts, cu) <- allClicks
        if cu == vu && cts.getTime >= vts.getTime &&
          cts.getTime <= vts.getTime + 30 * 60 * 1000
      } yield (vid, cid)).toSet
      assert(got == expected && expected.nonEmpty, s"got=$got expected=$expected")
    } finally query.stop()
  }

  test("stream-static enrichment: broadcast dim joined per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("event_id", "plugin_id")
    mem.addData((1L, "p1"), (2L, "p9"))
    val dim = Seq(("p1", "Stair Tool")).toDF("plugin_id", "display_name")
    val query = EventsStream.enrichWithDim(stream, dim, "plugin_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(query.awaitTermination(120000), "stream did not finish")
      val got = spark.table("enriched")
        .collect().map(r => r.getLong(1) -> Option(r.getString(2))).toMap
      assert(got == Map(1L -> Some("Stair Tool"), 2L -> None))
    } finally query.stop()
  }

  test("sessionize closes a session when the gap is exceeded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // user 1: two bursts 1h apart → the first burst closes when the
    // second arrives in the same batch
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 2.0),
      (3L, ts("2024-01-01 11:30:00"), 1L, "click", 3.0))
    val query = EventsStream.sessionize(events, gapMs = 10 * 60 * 1000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream
      .format("memory").queryName("sess").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(query.awaitTermination(120000), "stream did not finish in 120s")
      val got = spark.table("sess")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3), r.getDouble(4)))
      assert(got.toSeq == Seq(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 2, 3.0)))
    } finally query.stop()
  }

  test("streaming funnel matches the batch operator across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stages = Seq("view", "click", "purchase")
    // deterministic pseudo-random event soup: 40 users × 12 events,
    // types and minute offsets derived from (u, i) arithmetic —
    // includes out-of-order stage arrivals and users that stall
    val all = for (u <- 1L to 40L; i <- 0 until 12) yield {
      val tpe = stages(((u * 7 + i * 5) % 11 % 3).toInt)
      (u * 100 + i, ts(f"2024-01-01 ${10 + (i * 3 + u % 5) % 12}%02d:${(u * 13 + i * 17) % 60}%02d:00"),
        u, tpe, 1.0)
    }
    // split into two micro-batches with each user's FIRST half (by
    // ts) in batch 1 and the rest in batch 2 — the funnel stream's
    // cross-batch ordering contract
    val byUser = all.sortBy(e => (e._2.getTime, e._1)).groupBy(_._3)
    val b1 = byUser.values.flatMap(es => es.take(es.length / 2)).toSeq
    val b2 = byUser.values.flatMap(es => es.drop(es.length / 2)).toSeq
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = EventsStream.funnelProgress(events, stages,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream
      .format("memory").queryName("funnel").outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData(b1: _*)
      query.processAllAvailable()
      mem.addData(b2: _*)
      query.processAllAvailable()
      // streaming answer: deepest stage each user reached
      val streamed = spark.table("funnel")
        .groupBy("user_id").agg(max("stage_reached").as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // batch answer over the full history
      val batchTimes = graft.operators.Funnel.stageTimes(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"),
        "user_id", "ts", "event_type", stages)
      val batch = batchTimes.zipWithIndex.flatMap { case (df, k) =>
        df.select("user_id").collect().map(_.getLong(0) -> (k + 1))
      }.groupBy(_._1).map { case (u, ks) => u -> ks.map(_._2).max }
      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
    } finally query.stop()
  }

  test("funnel eviction lifecycle: timeout removes state, activity " +
      "refreshes the clock, an evicted user restarts from stage 0") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import EventsStream.{Event, FunnelState}
    val stages = IndexedSeq("view", "click")
    val handler = EventsStream.funnelHandler(stages,
      idleTimeoutMs = 1000L, useTimeout = true) _
    def ev(id: Long, t: String, tpe: String) =
      Event(id, ts(t), 1L, tpe, 1.0)
    def freshState(prior: Option[FunnelState], timedOut: Boolean = false) =
      TestGroupState.create[FunnelState](
        prior.map(Optional.of[FunnelState]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout, 1000L,
        Optional.empty[Long](), timedOut)

    // advance: emits, updates state, arms the eviction clock
    val s1 = freshState(None)
    val out1 = handler(1L, Iterator(ev(1, "2024-01-01 10:00:00", "view")), s1)
    assert(out1.toSeq.map(_.stage_reached) == Seq(1))
    assert(s1.isUpdated && s1.getTimeoutTimestampMs.isPresent)

    // activity WITHOUT advance still refreshes the eviction clock
    val s2 = freshState(Some(FunnelState(1, 0L)))
    val out2 = handler(1L, Iterator(ev(2, "2024-01-01 10:01:00", "view")), s2)
    assert(out2.isEmpty && !s2.isUpdated && s2.getTimeoutTimestampMs.isPresent)

    // timeout fires: state is REMOVED, nothing emitted
    val s3 = freshState(Some(FunnelState(1, 0L)), timedOut = true)
    assert(handler(1L, Iterator.empty, s3).isEmpty && s3.isRemoved)

    // after eviction a click finds a stage-0 machine: no emission...
    val s4 = freshState(None)
    assert(handler(1L, Iterator(ev(3, "2024-01-01 10:02:00", "click")), s4)
      .isEmpty && !s4.exists)
    // ...and a fresh view re-enters the funnel from the start
    val s5 = freshState(None)
    assert(handler(1L, Iterator(ev(4, "2024-01-01 10:03:00", "view")), s5)
      .toSeq.map(_.stage_reached) == Seq(1))

    // users that never enter the funnel store no state at all
    val s6 = freshState(None)
    assert(handler(2L, Iterator(ev(5, "2024-01-01 10:04:00", "click")), s6)
      .isEmpty && !s6.exists)
  }

  test("foldFunnel chains at microsecond precision like the batch operator") {
    import EventsStream.{Event, FunnelState, foldFunnel, tsMicros}
    val stages = IndexedSeq("view", "click")
    def at(us: Int): Timestamp = {
      val t = ts("2024-01-01 10:00:00"); t.setNanos(us * 1000); t
    }
    // click 100µs after the view: same millisecond, strictly after in
    // micros — the batch unix_micros chain advances, so must we
    val sorted = Seq(Event(1, at(100), 1L, "view", 1.0),
      Event(2, at(200), 1L, "click", 1.0))
    assert(foldFunnel(None, sorted, stages)
      .contains(FunnelState(2, tsMicros(at(200)))))
    // exact µs tie does NOT advance (batch uses strict >)
    val tied = Seq(Event(1, at(100), 1L, "view", 1.0),
      Event(2, at(100), 1L, "click", 1.0))
    assert(foldFunnel(None, tied, stages)
      .contains(FunnelState(1, tsMicros(at(100)))))
    // batch parity on the same sub-ms events
    val df = sorted.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batchDeepest = graft.operators.Funnel
      .stageTimes(df, "user_id", "ts", "event_type", stages)
      .zipWithIndex.flatMap { case (d, k) =>
        d.select("user_id").collect().map(_.getLong(0) -> (k + 1)) }
      .groupBy(_._1).map { case (u, ks) => u -> ks.map(_._2).max }
    assert(batchDeepest == Map(1L -> 2))
  }

  test("foldSessions gap compares at microsecond precision") {
    import EventsStream.{Event, SessionState, foldSessions, tsMicros}
    def at(us: Int): Timestamp = {
      val t = ts("2024-01-01 10:00:00"); t.setNanos(us * 1000); t
    }
    // two events 500µs apart with a 0ms... use 1ms gap: both inside
    val (closed, open) = foldSessions(1L, None,
      Seq(Event(1, at(0), 1L, "e", 1.0), Event(2, at(500), 1L, "e", 2.0)),
      gapMs = 1L)
    assert(closed.isEmpty && open.contains(
      SessionState(tsMicros(at(0)), tsMicros(at(500)), 2, 3.0)))
    // session timestamps survive the µs round-trip
    val (closed2, _) = foldSessions(1L, open,
      Seq(Event(3, ts("2024-01-01 11:00:00"), 1L, "e", 4.0)), gapMs = 1L)
    assert(closed2.head.session_end == at(500))
  }

  test("dedupWithinWatermark drops re-sent events, keeps distinct ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // event 1 re-sent twice (same id, later ts within horizon)
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (1L, ts("2024-01-01 10:00:30"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 2.0),
      (1L, ts("2024-01-01 10:02:00"), 1L, "click", 1.0))
    val query = EventsStream.dedupWithinWatermark(events, Seq("event_id"))
      .writeStream
      .format("memory").queryName("dedup").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(query.awaitTermination(120000), "stream did not finish in 120s")
      val got = spark.table("dedup").select("event_id").as[Long]
        .collect().sorted.toSeq
      assert(got == Seq(1L, 2L))
    } finally query.stop()
  }

  test("file-source stream over events parquet matches the batch windowed counts") {
    // stage the nanos-timestamped harness file as a stream directory
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventsStream.readEvents(spark, dir.toString)
    val query = EventsStream.windowedCounts(stream).writeStream
      .format("memory").queryName("filewc").outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(query.awaitTermination(120000), "stream did not finish in 120s")
      val streamed = spark.table("filewc")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("w"),
          col("event_type"), col("n"), col("total_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = SparkEntry.queries("q_window_tumbling")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("checkpointed file stream is exactly-once across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft_eo")
    val in = base.resolve("in"); java.nio.file.Files.createDirectories(in)
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val q = EventsStream.incrementalFileIngest(
        EventsStream.readEvents(spark, in.toString)
          .select("event_id", "event_type", "value"),
        out, ckpt)
      assert(q.awaitTermination(120000), "stream did not finish")
      q.stop()
    }
    val src = java.nio.file.Paths.get(sfDir, "events.parquet")
    val n = Tables_events_count
    java.nio.file.Files.copy(src, in.resolve("a.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() == n)
    // restart with no new data: nothing reprocessed
    runOnce()
    assert(spark.read.parquet(out).count() == n)
    // second file arrives; only it is processed on the next run
    java.nio.file.Files.copy(src, in.resolve("b.parquet"))
    runOnce()
    assert(spark.read.parquet(out).count() == 2 * n)
  }

  private lazy val Tables_events_count =
    graft.sources.Tables.table(spark, sfDir, "events").count()

  test("foldSessions: gap splits, carry-over state, multi-close") {
    import EventsStream.{Event, Session, SessionState, foldSessions}
    def ev(id: Long, t: String, v: Double) = Event(id, ts(t), 1L, "e", v)
    // three bursts in one batch → two closed, one open
    val (closed, open) = foldSessions(1L, None, Seq(
      ev(1, "2024-01-01 10:00:00", 1.0), ev(2, "2024-01-01 10:05:00", 2.0),
      ev(3, "2024-01-01 11:00:00", 4.0),
      ev(4, "2024-01-01 12:00:00", 8.0)), gapMs = 10 * 60 * 1000L)
    assert(closed == List(
      Session(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 2, 3.0),
      Session(1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00"), 1, 4.0)))
    assert(open.contains(SessionState(
      EventsStream.tsMicros(ts("2024-01-01 12:00:00")),
      EventsStream.tsMicros(ts("2024-01-01 12:00:00")), 1, 8.0)))
    // carried state extends across batches within the gap
    val (closed2, open2) = foldSessions(1L, open,
      Seq(ev(5, "2024-01-01 12:05:00", 1.0)), gapMs = 10 * 60 * 1000L)
    assert(closed2.isEmpty)
    assert(open2.exists(_.nEvents == 2))
  }

  test("composed streaming pipeline: dedup -> dim enrichment -> exactly-once sink") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_pipe")
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val dim = Seq(("click", "Click Event")).toDF("event_type", "label")
    // ONE source across restarts: the checkpoint stores committed
    // offsets, so a fresh MemoryStream (offsets restarting at 0)
    // would have its data skipped as already-seen
    val mem = MemoryStream[(Long, Timestamp, String)]
    def runBatch(): Unit = {
      val stream = mem.toDF().toDF("event_id", "ts", "event_type")
      val staged = EventsStream.enrichWithDim(
        EventsStream.dedupWithinWatermark(stream, Seq("event_id")),
        dim, "event_type")
      val q = EventsStream.incrementalFileIngest(staged, out, ckpt)
      assert(q.awaitTermination(120000), "stream did not finish")
      q.stop()
    }
    // batch 1: a duplicate event_id inside the watermark horizon drops
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:01"), "click"), // re-sent
      (2L, ts("2024-01-01 10:00:02"), "view"))
    runBatch()
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.count() == 2)
    assert(afterFirst.filter($"event_id" === 1L).head().getAs[String]("label")
      == "Click Event")
    // batch 2 restarts from the checkpoint: only new data lands
    mem.addData((3L, ts("2024-01-01 10:00:05"), "view"))
    runBatch()
    assert(spark.read.parquet(out).count() == 3)
  }
}
