package graft

import graft.operators.AsOf
import java.sql.Timestamp

/** Backward as-of join semantics on hand-built frames. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest at-or-before match per key; left rows without one keep nulls") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 10:00:01"), "t3") // before any quote for key 2
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:03"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0), // equal-time: matches t2
      (2L, ts("2024-01-01 10:00:02"), 50.0)
    ).toDF("sym", "ts", "px")

    val got = AsOf.asofJoinBackward(trades, quotes, Seq("sym"), "ts", "ts")
      .select("trade_id", "asof_px")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> None))
  }

  test("null keys never match (SQL equality), but null-key left rows survive unmatched") {
    val trades = Seq(
      (Some(1L), ts("2024-01-01 10:00:05"), "t1"),
      (None, ts("2024-01-01 10:00:05"), "t_nullkey")
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      (Some(1L), ts("2024-01-01 10:00:03"), 100.0),
      (None, ts("2024-01-01 10:00:01"), 666.0) // must match nothing
    ).toDF("sym", "ts", "px")
    val got = AsOf.asofJoinBackward(trades, quotes, Seq("sym"), "ts", "ts")
      .select("trade_id", "asof_px")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("t1" -> Some(100.0), "t_nullkey" -> None))
  }

  test("columns: left untouched, right payload prefixed, keys once") {
    val l = Seq((1L, ts("2024-01-01 00:00:02"), "x")).toDF("k", "ts", "lv")
    val r = Seq((1L, ts("2024-01-01 00:00:01"), "y")).toDF("k", "ts", "rv")
    val out = AsOf.asofJoinBackward(l, r, Seq("k"), "ts", "ts")
    assert(out.columns.toSeq == Seq("k", "ts", "lv", "asof_ts", "asof_rv"))
    val row = out.head()
    assert(row.getAs[String]("lv") == "x" && row.getAs[String]("asof_rv") == "y")
    assert(row.getAs[Timestamp]("ts") == ts("2024-01-01 00:00:02"))
    assert(row.getAs[Timestamp]("asof_ts") == ts("2024-01-01 00:00:01"))
  }
}
