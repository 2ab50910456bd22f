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
}
