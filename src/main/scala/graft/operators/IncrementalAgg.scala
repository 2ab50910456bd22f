package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table (a materialized rollup):
  * one row per key holding MERGEABLE state — row count, per-column
  * sums, and the max watermark — folded forward batch by batch.
  * Keeping a 100 TB corpus's rollup current then costs one
  * state-sized merge per increment (state = |keys| rows, usually
  * millions at most) instead of a full-history rescan; derived
  * measures (averages, rates) are computed at read time from the
  * state, never stored, so they are always consistent with it.
  *
  * Publication is [[AtomicIncrement]]'s manifest commit: readers get
  * snapshot isolation, concurrent writers collide on the optimistic
  * version token, and replaying a delivered batch is a no-op — the
  * stored watermark filters it to zero rows and no new version is
  * published (the same high-watermark contract as
  * `Incremental.appendIncrement`, which also means batches must
  * arrive in watermark order). Mirrors the reference's max-date
  * incremental pattern (extractor_legacy/load_increment.py) lifted
  * from row appends to aggregate state.
  */
object IncrementalAgg {

  /** Fold one increment into the state at `sink`. Returns the number
    * of fresh rows folded (0 = replay or empty batch; nothing
    * published).
    */
  def mergeBatch(batch: DataFrame, sink: String, keys: Seq[String],
      sumCols: Seq[String], watermarkCol: String): Long =
    mergeWithHook(batch, sink, keys, sumCols, watermarkCol, () => ())

  private[graft] def mergeWithHook(batch: DataFrame, sink: String,
      keys: Seq[String], sumCols: Seq[String], watermarkCol: String,
      beforePublish: () => Unit): Long = {
    val spark = batch.sparkSession
    val (version, prior) = AtomicIncrement.snapshot(spark, sink)
    val wm = if (prior.isEmpty) None
      else Option(readState(spark, sink).agg(max("__wm")).head().get(0))
    val fresh = wm match {
      case Some(w) => batch.filter(col(watermarkCol) > lit(w))
      case None => batch
    }
    // Aggregate FIRST, cache the aggregate: the fresh-row count is
    // Σ __n over the partial, so the increment is scanned exactly once
    // and the cache holds |keys| rows — not the batch. The previous
    // shape cached the raw increment and scanned it twice (count, then
    // groupBy); at 100 TB that cache is the whole arriving batch.
    val partial = fresh.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("__n"),
      sumCols.map(c => sum(col(c)).as(s"sum_$c")) :+
        max(col(watermarkCol)).as("__wm"): _*)
      .persist()
    try {
      val n = partial.agg(coalesce(sum("__n"), lit(0L))).head().getLong(0)
      if (n > 0) {
        val merged =
          if (prior.isEmpty) partial
          else readState(spark, sink).unionByName(partial)
            .groupBy(keys.map(col): _*).agg(
              sum("__n").as("__n"),
              sumCols.map(c => sum(s"sum_$c").as(s"sum_$c")) :+
                max("__wm").as("__wm"): _*)
        AtomicIncrement.replaceWithHook(merged, sink, version, beforePublish)
      }
      n
    } finally { partial.unpersist(); () }
  }

  /** The committed state: keys, `__n`, `sum_<col>`s, `__wm`. */
  def readState(spark: org.apache.spark.sql.SparkSession,
      sink: String): DataFrame =
    AtomicIncrement.readCommitted(spark, sink)

  /** Run a query whose plumbing needs a scratch atomic sink, then
    * reclaim the sink DETERMINISTICALLY: the output (small by
    * construction — these queries end in an aggregate of at most a
    * few rows) is materialized, the scratch directory deleted, and
    * the rows re-wrapped as a local frame. Without this every
    * bench/scale invocation stranded a fresh multi-copy temp sink on
    * disk — unbounded accumulation across repeated runs.
    */
  private def withScratchSink(spark: org.apache.spark.sql.SparkSession,
      prefix: String)(body: String => DataFrame): DataFrame = {
    val sink = java.nio.file.Files.createTempDirectory(prefix).toString
    try {
      val out = body(sink)
      val rows = out.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally {
      val p = new org.apache.hadoop.fs.Path(sink)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      ()
    }
  }

  def defs: Map[String, QueryDef] = Map(
    // Data-skipping read under the oracle gate: lineitem lands in an
    // atomic sink as three orderkey-range increments (disjoint
    // per-file stats intervals by construction), then the
    // incremental-consumer query — rows above the second cut — reads
    // through readCommittedAbove. The manifest prunes the first two
    // batches' files without touching them; the oracle aggregates the
    // raw source directly, so the pruned read must be
    // indistinguishable from a full scan + filter. `pruned` pins that
    // skipping ENGAGED (strictly fewer files listed than committed) —
    // a regression to read-everything flips it and hash-mismatches.
    "q_read_pruned" -> QueryDef(
      (s, dir) => withScratchSink(s, "graft_skipread") { sink =>
        val li = table(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        val mx = li.agg(max("l_orderkey")).head().getLong(0)
        var lo = Long.MinValue
        for (hi <- Seq(mx / 3, 2 * mx / 3, mx)) {
          AtomicIncrement.appendIncrementAtomic(
            li.filter(col("l_orderkey") > lo && col("l_orderkey") <= hi),
            sink, "l_orderkey")
          lo = hi
        }
        val cut = 2 * mx / 3
        val pruned = AtomicIncrement.readCommittedAbove(s, sink,
          "l_orderkey", cut)
        val engaged = pruned.inputFiles.length <
          AtomicIncrement.committedFiles(s, sink).size
        pruned.filter(col("l_orderkey") > cut)
          .agg(count(lit(1)).as("n"),
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_price"))
          .withColumn("pruned", lit(engaged))
      },
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price, TRUE AS pruned
        |FROM lineitem
        |WHERE l_orderkey > 2 * (SELECT max(l_orderkey) FROM lineitem) // 3
        |""".stripMargin),

    // The fold under the oracle gate: lineitem arrives as three
    // orderkey-range increments, each merged into the state table;
    // the oracle aggregates the FULL history in one pass — so the
    // merge algebra (counts add, sums add, avg derived from state)
    // must reproduce the rescan exactly.
    "q_incr_agg" -> QueryDef(
      (s, dir) => withScratchSink(s, "graft_incragg") { sink =>
        val li = table(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        val mx = li.agg(max("l_orderkey")).head().getLong(0)
        var lo = Long.MinValue
        for (hi <- Seq(mx / 3, 2 * mx / 3, mx)) {
          mergeBatch(li.filter(col("l_orderkey") > lo && col("l_orderkey") <= hi),
            sink, Seq("l_returnflag", "l_linestatus"),
            Seq("l_quantity", "l_extendedprice"), "l_orderkey")
          lo = hi
        }
        readState(s, sink)
          .select(col("l_returnflag"), col("l_linestatus"),
            col("__n").as("n"),
            round(col("sum_l_quantity"), 2).as("sum_qty"),
            round(col("sum_l_extendedprice") / col("__n"), 6).as("avg_price"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice) / count(*), 6) AS avg_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))
}
