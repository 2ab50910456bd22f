package graft

import org.apache.spark.sql.functions._

/** Round-18 plan evidence: the scratch-fixture queries' FINAL plans
  * are `LocalTableScan` by construction (withScratchSink collects and
  * re-wraps — the r17 measurement note), so the round's plan claims
  * are pinned on the INTERNAL frames the changes reshaped:
  *
  *  - `fold_state`: the CDC fold's merged-state frame (state + plus +
  *    minus). Round 18 fused it to ONE hash aggregate over signed
  *    contributions; the before shape (two per-side aggregates
  *    unioned, then a re-aggregate — three exchanges) is what commit
  *    e20bc16's `signedAgg`/`mergeCdcCore` built and is dumped from
  *    that tree with this same probe's `before` mode (verbatim
  *    replica of the old private construction).
  *  - `zorder_bounds`: the grid-bounds aggregate. Round 18 serves it
  *    from manifest stats over a two-row local frame on a dv-free
  *    snapshot; before, the same aggregate scanned the whole table.
  *
  * Usage: `runMain graft.R18PlanDump [before|after]` (default after).
  */
object R18PlanDump {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("after")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = graft.sources.Tables.table(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val sink = java.nio.file.Files
      .createTempDirectory("graft_plandump").toString
    // a committed prior state so the dump shows the full three-way fold
    graft.operators.IncrementalAgg.mergeCdcBatch(o, o.limit(0), sink,
      Seq("o_orderstatus"), Seq("o_totalprice"), 0L)
    val prior = Some(
      graft.operators.IncrementalAgg.readState(spark, sink))
    val plus = o.filter(col("o_orderkey") % 10 === 3)
    val minus = o.filter(col("o_orderkey") % 10 === 7)
    val keys = Seq("o_orderstatus")
    val sums = Seq("o_totalprice")
    println(s"\n========== fold_state ($mode) ==========")
    val folded =
      if (mode == "before") {
        // verbatim replica of the pre-round-18 private shape
        // (signedAgg per side, union, re-aggregate) — dump from the
        // e20bc16 tree for the committed before-file
        def signedAgg(df: org.apache.spark.sql.DataFrame, sign: Int) =
          df.groupBy(keys.map(col): _*).agg(
            (count(lit(1)) * sign).as("__n"),
            sums.map(c =>
              (coalesce(sum(col(c)), lit(0.0)) * sign).as(s"sum_$c")): _*)
        val delta = signedAgg(plus, 1).unionByName(signedAgg(minus, -1))
        prior.map(_.drop("__b").unionByName(delta)).getOrElse(delta)
          .groupBy(keys.map(col): _*).agg(
            sum("__n").as("__n"),
            sums.map(c => sum(s"sum_$c").as(s"sum_$c")): _*)
          .filter(col("__n") > 0)
      } else
        graft.operators.IncrementalAgg.mergedCdcState(
          prior, plus, minus, keys, sums, None)
    folded.explain("formatted")
    // zorder grid bounds: before = the same min/max aggregate over the
    // committed snapshot (a table scan); after = over the two-row
    // local frame built from manifest stats (compactZordered's dv-free
    // fast path). The aggregate EXPRESSIONS are identical — only the
    // input relation changes, which is the whole point.
    println(s"\n========== zorder_bounds ($mode) ==========")
    val snap = graft.operators.AtomicIncrement.readCommitted(spark, sink)
    val ord = col("o_orderkey").cast("long")
    val boundAggs = Seq(min(ord).cast("long"), max(ord).cast("long"))
    val zsrc =
      if (mode == "before")
        graft.operators.AtomicIncrement
          .readCommitted(spark, zSink(spark, dir))
      else {
        import org.apache.spark.sql.types._
        spark.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(1L), org.apache.spark.sql.Row(9L)),
          StructType(Seq(StructField("o_orderkey", LongType, true))))
      }
    zsrc.agg(boundAggs.head, boundAggs.tail: _*).explain("formatted")
    val _ = snap
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(sink))
    spark.stop()
  }

  private def zSink(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val o = graft.sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val s = java.nio.file.Files.createTempDirectory("graft_pdz").toString
    graft.operators.AtomicIncrement.appendIncrementAtomic(o, s,
      "o_orderkey", extraStatsCols = Seq("o_custkey"))
    s
  }
}
