package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incrementally-maintained rollup: batch folds converge to the
  * full-history aggregate, replays are no-ops, and a crash between
  * stage and publish leaves the old state visible with a convergent
  * re-run.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_incragg_spec").resolve("state").toString

  private val keys = Seq("g")
  private val sums = Seq("x")

  private def rows(r: Range) = r.map(i => (i.toLong, s"g${i % 3}", i * 1.5))
    .toDF("ts", "g", "x")

  private def state(sink: String) =
    IncrementalAgg.readState(spark, sink)
      .select("g", "__n", "sum_x")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("three folds equal the one-pass aggregate; replay is a no-op") {
    val sink = tmp()
    assert(IncrementalAgg.mergeBatch(rows(1 to 40), sink, keys, sums, "ts") == 40)
    assert(IncrementalAgg.mergeBatch(rows(41 to 70), sink, keys, sums, "ts") == 30)
    assert(IncrementalAgg.mergeBatch(rows(71 to 100), sink, keys, sums, "ts") == 30)
    val direct = rows(1 to 100).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val folded = state(sink)
    assert(folded.map(t => (t._1, t._2)) == direct.map(t => (t._1, t._2)))
    for ((f, d) <- folded.zip(direct))
      assert(math.abs(f._3 - d._3) < 1e-9, s"sum drift: $f vs $d")
    // replaying an already-folded batch publishes nothing
    val before = graft.operators.AtomicIncrement.snapshot(spark, sink)._1
    assert(IncrementalAgg.mergeBatch(rows(41 to 70), sink, keys, sums, "ts") == 0)
    assert(graft.operators.AtomicIncrement.snapshot(spark, sink)._1 == before)
  }

  test("crash between stage and publish: old state visible, re-run converges") {
    val sink = tmp()
    IncrementalAgg.mergeBatch(rows(1 to 30), sink, keys, sums, "ts")
    val old = state(sink)
    val boom = new RuntimeException("crash before publish")
    val thrown = intercept[RuntimeException] {
      IncrementalAgg.mergeWithHook(rows(31 to 60), sink, keys, sums, "ts",
        () => throw boom)
    }
    assert(thrown eq boom)
    // a reader at this instant sees exactly the pre-crash state
    assert(state(sink) == old)
    // the re-run folds the same batch off the committed watermark
    assert(IncrementalAgg.mergeBatch(rows(31 to 60), sink, keys, sums, "ts") == 30)
    val direct = rows(1 to 60).groupBy("g")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state(sink).map(t => t._1 -> t._2).toMap == direct)
  }

  test("out-of-order (below-watermark) rows are dropped, not double-counted") {
    val sink = tmp()
    IncrementalAgg.mergeBatch(rows(1 to 50), sink, keys, sums, "ts")
    // a batch straddling the watermark folds only its fresh suffix
    assert(IncrementalAgg.mergeBatch(rows(40 to 80), sink, keys, sums, "ts") == 30)
    val total = IncrementalAgg.readState(spark, sink)
      .agg(sum("__n")).head().getLong(0)
    assert(total == 80)
  }

  test("CDC retraction fold: updates move a group by the before/after " +
      "delta, a fully-retracted group vanishes (matching a rescan), a " +
      "replayed batch no-ops") {
    val sink = tmp()
    // init: batch 0 adds everything (the minus side is empty)
    assert(IncrementalAgg.mergeCdcBatch(rows(1 to 30), rows(1 to 0),
      sink, keys, sums, 0L))
    // change batch 1: re-state rows 1..6 with x doubled (retract the
    // before-images, add the after-images) and DELETE the g2 rows NOT
    // being re-stated — each standing row retracts exactly once (the
    // mergeCdcBatch contract; a CDC resolve guarantees it upstream)
    val before = rows(1 to 6)
    val after = rows(1 to 6).withColumn("x", col("x") * 2)
    val g2Del = rows(1 to 30).filter(col("g") === "g2" && col("ts") > 6)
    assert(IncrementalAgg.mergeCdcBatch(after,
      before.unionByName(g2Del), sink, keys, sums, 1L))
    // reference: a one-pass rescan of the mutated table — rows 2 and 5
    // are g2 AND re-stated, so g2 survives with exactly those two rows
    val mutated = rows(1 to 30)
      .join(rows(1 to 6).select(col("ts").as("__u")),
        col("ts") === col("__u"), "left_anti")
      .filter(!(col("g") === "g2" && col("ts") > 6))
      .unionByName(after)
    val direct = mutated.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(state(sink) == direct, s"retraction fold diverged: " +
      s"${state(sink)} vs $direct")
    // replay of batch 1 must not re-apply
    assert(!IncrementalAgg.mergeCdcBatch(after,
      before.unionByName(g2Del), sink, keys, sums, 1L))
    assert(state(sink) == direct)
    // batch 2 retracts EVERYTHING still standing in g1: the group
    // leaves the state, exactly as a rescan of the remnant would show
    val g1Now = mutated.filter(col("g") === "g1")
    assert(IncrementalAgg.mergeCdcBatch(rows(1 to 0), g1Now,
      sink, keys, sums, 2L))
    assert(!state(sink).exists(_._1 == "g1"),
      "fully-retracted group survived in the state")
  }

  test("CDC fold composes with mergeAtomic's delta frames: maintaining " +
      "the rollup from a table merge equals re-aggregating the table") {
    import graft.operators.AtomicIncrement
    val tableSink = tmp()
    val stateSink = tmp()
    // the table loads range-clustered on ts; the rollup initializes
    // from the same load
    AtomicIncrement.appendIncrementAtomic(
      rows(1 to 15).repartition(1), tableSink, "ts")
    AtomicIncrement.appendIncrementAtomic(
      rows(16 to 30).repartition(1), tableSink, "ts")
    IncrementalAgg.mergeCdcBatch(rows(1 to 30), rows(1 to 0),
      stateSink, keys, sums, 0L)
    // one change batch through the table: update 20, delete 25
    val changes = Seq((20L, "gX", 999.0, false), (25L, "", 0.0, true))
      .toDF("ts", "g", "x", "del")
    val res = AtomicIncrement.mergeAtomic(changes, tableSink, "ts", "del")
    assert(res.carried == 1 && res.rewritten == 1, s"pruning broke: $res")
    // fold EXACTLY the frames the merge handed back
    IncrementalAgg.mergeCdcBatch(res.upserts, res.beforeImages,
      stateSink, keys, sums, 1L)
    val direct = AtomicIncrement.readCommitted(spark, tableSink)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(state(stateSink) == direct,
      s"maintained rollup diverged from the merged table: " +
        s"${state(stateSink)} vs $direct")
  }

  test("CDC fold keeps integer sums INTEGRAL (LongType, exact) — " +
      "parity with mergeBatch's native long sums, no float drift") {
    val sink = tmp()
    def intRows(r: Range) = r.map(i => (i.toLong, s"g${i % 2}", i.toLong))
      .toDF("ts", "g", "cnt")
    assert(IncrementalAgg.mergeCdcBatch(intRows(1 to 20), intRows(1 to 0),
      sink, keys, Seq("cnt"), 0L))
    val st0 = IncrementalAgg.readState(spark, sink)
    assert(st0.schema("sum_cnt").dataType ==
      org.apache.spark.sql.types.LongType,
      s"integer sum widened: ${st0.schema("sum_cnt").dataType}")
    // retract 1..4, re-state with cnt+1000 — both signed halves run
    // the long algebra; the result is exact long arithmetic
    assert(IncrementalAgg.mergeCdcBatch(
      intRows(1 to 4).withColumn("cnt", col("cnt") + 1000L),
      intRows(1 to 4), sink, keys, Seq("cnt"), 1L))
    val got = IncrementalAgg.readState(spark, sink)
      .select("g", "__n", "sum_cnt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val direct = intRows(1 to 20)
      .join(intRows(1 to 4).select(col("ts").as("__u")),
        col("ts") === col("__u"), "left_anti")
      .unionByName(intRows(1 to 4).withColumn("cnt", col("cnt") + 1000L))
      .groupBy("g").agg(count(lit(1)).as("n"), sum("cnt").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == direct, s"long CDC fold diverged: $got vs $direct")
  }
}
