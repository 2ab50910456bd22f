package graft

import graft.operators.{AtomicIncrement, IncrementalAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bounded-state top-k sketch ([[IncrementalAgg.mergeCdcTopKSketch]]):
  * state stays capped at high cardinality, planted heavy hitters
  * surface with estimates inside the CM band, retraction demotes
  * exactly, and the `__b` shield makes replays no-ops.
  */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  /** 5 planted heavy hitters (values 1..5, 400 + 50·v rows each) over
    * a 20 000-value uniform tail (1 row each) in one group.
    */
  private def planted: DataFrame = {
    val heavy = (1 to 5).flatMap(v => Seq.fill(400 + 50 * v)(v.toLong))
    val tail = (1000L until 21000L)
    (heavy ++ tail).map(("g", _)).toDF("grp", "v")
  }

  test("state stays bounded at 20k-value cardinality and the planted " +
      "heavy hitters rank inside the CM band") {
    val sink = tmp("graft_tks")
    try {
      val df = planted
      IncrementalAgg.mergeCdcTopKSketch(df, df.limit(0), sink,
        Seq("grp"), "v", 0L, k = 5, width = 2048, depth = 3)
      val pool = IncrementalAgg.readState(spark, s"$sink/pool")
      assert(pool.count() <= 20L, "pool must prune to poolFactor*k")
      val cells = IncrementalAgg.readState(spark, s"$sink/cm")
      assert(cells.count() <= 3L * 2048L, "cells bounded by depth*width")
      val top = IncrementalAgg.readTopKSketch(spark, sink, Seq("grp"),
        "v", 5).orderBy("rank").collect()
      assert(top.map(_.getLong(1)).toSeq === Seq(5L, 4L, 3L, 2L, 1L))
      val n = df.count()
      for (r <- top) {
        val v = r.getLong(1); val est = r.getLong(2)
        val truth = 400L + 50L * v
        assert(est >= truth, s"CM estimate must never undercount: $r")
        assert(est - truth <= math.max(1L, (math.E / 2048.0 * n).toLong),
          s"CM estimate outside band: $r (true $truth, n $n)")
      }
    } finally rm(sink)
  }

  test("retraction demotes a touched heavy hitter exactly and the " +
      "replay shield holds") {
    val sink = tmp("graft_tkr")
    try {
      val df = planted
      IncrementalAgg.mergeCdcTopKSketch(df, df.limit(0), sink,
        Seq("grp"), "v", 0L, k = 3)
      // retract most of value 5's mass: 600 of its 650 rows
      val minus = Seq.fill(600)(("g", 5L)).toDF("grp", "v")
      assert(IncrementalAgg.mergeCdcTopKSketch(df.limit(0), minus, sink,
        Seq("grp"), "v", 1L, k = 3))
      val top = IncrementalAgg.readTopKSketch(spark, sink, Seq("grp"),
        "v", 3).orderBy("rank").collect()
      // 5 drops out of the podium (50 rows left); 4, 3, 2 move up
      assert(top.map(_.getLong(1)).toSeq === Seq(4L, 3L, 2L))
      // replay of batch 1: cells and pool must not move
      val before = IncrementalAgg.readState(spark, s"$sink/cm")
        .agg(sum("__n")).head().getLong(0)
      assert(!IncrementalAgg.mergeCdcTopKSketch(df.limit(0), minus, sink,
        Seq("grp"), "v", 1L, k = 3))
      val after = IncrementalAgg.readState(spark, s"$sink/cm")
        .agg(sum("__n")).head().getLong(0)
      assert(before === after, "a replayed batch moved the cells")
    } finally rm(sink)
  }
}
