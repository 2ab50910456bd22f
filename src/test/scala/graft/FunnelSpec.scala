package graft

import graft.operators.Funnel
import java.sql.Timestamp

/** Ordered-funnel semantics: strictly-after chaining, out-of-order
  * exclusion, and drop-off counting.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("stage k counts only events strictly after stage k-1's earliest time") {
    val events = Seq(
      // u1 completes in order: view@1, click@2, purchase@3
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2 clicks BEFORE its first view and never after: stalls at
      // view, and the later purchase must not count either — stage 2
      // chains off an IN-ORDER stage 1, which u2 never completed
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "purchase"),
      // u3 views only
      (3L, ts(5), "view"),
      // u4 never views: no stage counts at all, even with click+purchase
      (4L, ts(1), "click"), (4L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events,
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0, "view", 3L),      // u1, u2, u3
      (1, "click", 1L),     // only u1 clicks after viewing
      (2, "purchase", 1L))) // only u1 converts end to end
  }

  test("windowed funnel: conversions outside the span from first view " +
      "do not count") {
    val events = Seq(
      // u1 converts fully inside a 10-minute window
      (1L, ts(0), "view"), (1L, ts(4), "click"), (1L, ts(8), "purchase"),
      // u2 clicks inside but purchases outside the window
      (2L, ts(0), "view"), (2L, ts(4), "click"), (2L, ts(30), "purchase"),
      // u3 clicks outside the window: stalls at view
      (3L, ts(0), "view"), (3L, ts(20), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events,
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        maxSpanMicros = 10L * 60 * 1000000)
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("invariants on random event soup: stage counts never increase " +
      "down the funnel; windowing never adds conversions") {
    val stages = Seq("view", "click", "purchase")
    // deterministic pseudo-random soup, same recipe as the streaming
    // parity test: out-of-order arrivals, stalls, repeats
    val all = for (u <- 1L to 60L; i <- 0 until 10) yield {
      val tpe = stages(((u * 7 + i * 5) % 11 % 3).toInt)
      (u * 100 + i,
        ts(((u * 13 + i * 29) % 300).toInt), u, tpe, 1.0)
    }
    val df = all.toDF("event_id", "ts", "user_id", "event_type", "value")
    def counts(spanMicros: Long): Seq[Long] =
      Funnel.funnelCounts(df, "user_id", "ts", "event_type", stages,
          maxSpanMicros = spanMicros)
        .orderBy("stage_idx").collect().map(_.getLong(2)).toSeq
    val unbounded = counts(0L)
    val windowed = counts(30L * 60 * 1000000) // 30 minutes
    // funnel shape: each stage can only lose users
    assert(unbounded == unbounded.sorted.reverse, s"not monotone: $unbounded")
    assert(windowed == windowed.sorted.reverse, s"not monotone: $windowed")
    // a conversion window can only REMOVE conversions, and stage 0
    // (the window anchor) is identical by definition
    assert(windowed.head == unbounded.head)
    assert(windowed.zip(unbounded).forall { case (w, u) => w <= u },
      s"window added conversions: $windowed vs $unbounded")
    // sanity: the soup actually converts somewhere
    assert(unbounded.last > 0)
  }

  test("same-timestamp stage events do not convert (strictly after)") {
    val events = Seq(
      (1L, ts(1), "view"), (1L, ts(1), "click"), // simultaneous
      (2L, ts(1), "view"), (2L, ts(2), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelCounts(events,
        "user_id", "ts", "event_type", Seq("view", "click"))
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("view", 2L), ("click", 1L)))
  }
}
