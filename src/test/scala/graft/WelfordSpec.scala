package graft

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, MomentState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

/** Streaming Welford moments and prefix z-score anomalies — the
  * bounded-state twin of the batch `q_outliers` statistics.
  */
class WelfordSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("runningStats converges to batch avg/stddev_pop across " +
      "micro-batches with O(groups) state") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables.table(spark, sfDir, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    assert(events.length > 300)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val query = EventsStream.runningStats(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("welford")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      for (slice <- events.grouped((events.length / 3).max(1)))
        { mem.addData(slice.toSeq: _*); query.processAllAvailable() }
      // Update mode re-emits a group on every batch; keep the last row
      val streamed = spark.table("welford")
        .groupBy("event_type")
        .agg(max(struct(col("n"), col("mu"), col("sd"))).as("s"))
        .select(col("event_type"), col("s.n"), col("s.mu"), col("s.sd"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      val batch = graft.sources.Tables.table(spark, sfDir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), avg("value").as("mu"),
          stddev_pop("value").as("sd"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, (n, mu, sd)) =>
        val (bn, bmu, bsd) = batch(k)
        assert(n == bn, s"$k count")
        assert(math.abs(mu - bmu) <= 1e-9 * math.max(1, math.abs(bmu)), s"$k mean")
        assert(math.abs(sd - bsd) <= 1e-9 * math.max(1, math.abs(bsd)), s"$k sd")
      }
      val st = query.lastProgress.stateOperators
      assert(st.nonEmpty && st.map(_.numRowsTotal).sum <= batch.size,
        "state exceeded one row per group")
    } finally query.stop()
  }

  test("transformWithState twin reproduces runningStats exactly " +
      "(RocksDB store, micro-batched)") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables.table(spark, sfDir, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val query = EventsStream.runningStatsTws(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("welford_tws")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      for (slice <- events.grouped((events.length / 3).max(1)))
        { mem.addData(slice.toSeq: _*); query.processAllAvailable() }
      val streamed = spark.table("welford_tws")
        .groupBy("event_type")
        .agg(max(struct(col("n"), col("mu"), col("sd"))).as("s"))
        .select(col("event_type"), col("s.n"), col("s.mu"), col("s.sd"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      // bit-for-bit against a driver replay of the SAME fold in the
      // same arrival order — the two APIs share MomentState.add
      val expected = events.groupBy(_._4).view.mapValues { es =>
        val s = es.foldLeft(MomentState(0, 0, 0))((a, e) => a.add(e._5))
        (s.n, s.mean, math.sqrt(s.m2 / s.n))
      }.toMap
      assert(streamed == expected)
    } finally {
      query.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("Welford mean/M2 stay stable at a 1e9 offset where naive " +
      "sum-of-squares cancels") {
    val xs = (1 to 2000).map(i => 1e9 + (i % 7) - 3.0)
    val s = xs.foldLeft(MomentState(0, 0, 0))(_.add(_))
    val exact = {
      val mu = xs.sum / xs.length
      (mu, math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length))
    }
    assert(math.abs(s.mean - exact._1) / exact._1 < 1e-12)
    assert(math.abs(math.sqrt(s.m2 / s.n) - exact._2) / exact._2 < 1e-9)
  }

  test("foldAnomalies: score-then-update, warmup gate, sd=0 guard") {
    def ev(id: Long, v: Double) =
      Event(id, ts(f"2024-01-01 10:${id}%02d:00"), 1L, "x", v)
    // early spike at id=5 lands inside the warmup window -> silent
    val spiky = (0 until 30).map(i =>
      ev(i, if (i == 5) 99.0 else if (i % 2 == 0) 9.0 else 11.0))
    val (none, _) = EventsStream.foldAnomalies("x",
      MomentState(0, 0, 0), spiky, 3.0, 30)
    assert(none.isEmpty)
    // clean warmup: mean 10, sd 1 — the baseline the spike is judged by
    val warm = (0 until 30).map(i => ev(i, if (i % 2 == 0) 9.0 else 11.0))
    val (none2, s30) = EventsStream.foldAnomalies("x",
      MomentState(0, 0, 0), warm, 3.0, 30)
    assert(none2.isEmpty && s30.n == 30)
    // post-warmup: 50.0 flags against stats EXCLUDING itself
    val (hits, s32) = EventsStream.foldAnomalies("x", s30,
      Seq(ev(30, 10.0), ev(31, 50.0), ev(32, 10.5)), 3.0, 30)
    assert(hits.map(_.event_id) == List(31L))
    val sdBefore = math.sqrt(s30.add(10.0).m2 / 31)
    val muBefore = s30.add(10.0).mean
    assert(math.abs(hits.head.z - (50.0 - muBefore) / sdBefore) < 1e-12)
    assert(s32.n == 33)
    // constant group: sd=0 never divides
    val flat = (0 until 40).map(i => ev(i, 7.0))
    val (quiet, _) = EventsStream.foldAnomalies("x",
      MomentState(0, 0, 0), flat, 3.0, 30)
    assert(quiet.isEmpty)
  }

  test("anomalies stream across micro-batches equals one fold over " +
      "the ts-ordered history") {
    implicit val sqlCtx = spark.sqlContext
    val all = (0 until 120).map { i =>
      val v = if (i == 70 || i == 95) 60.0 + i else 10.0 + (i % 5)
      (i.toLong, ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00"),
        1L, "t", v)
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val query = EventsStream.anomalies(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      threshold = 3.0, minN = 30)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      for (slice <- all.grouped(40))
        { mem.addData(slice.toSeq: _*); query.processAllAvailable() }
      val streamed = spark.table("anomalies")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val events = all.map { case (id, t, u, tp, v) => Event(id, t, u, tp, v) }
      val (folded, _) = EventsStream.foldAnomalies("t",
        MomentState(0, 0, 0), events, 3.0, 30)
      assert(streamed == folded.map(_.event_id).sorted)
      assert(streamed.contains(70L) && streamed.contains(95L))
    } finally query.stop()
  }
}
