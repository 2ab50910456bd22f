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

  /** Retraction fold — the CDC face of the maintained rollup, for
    * feeds that UPDATE and DELETE instead of only appending (where
    * [[mergeBatch]]'s high-watermark contract applies): `plus` holds a
    * change batch's after-images, `minus` the before-images of every
    * churned key (exactly what [[AtomicIncrement.MergeResult]] hands
    * back from a table merge), and the state moves by
    * `Σ(plus) − Σ(minus)` per group — count and sums are abelian, so
    * the fold costs one churn-sized aggregate plus a |keys|-row merge,
    * never a rescan of the table the rollup summarizes. A group whose
    * count retracts to zero leaves the state (matching what a fresh
    * rescan would produce); retracting rows that were never added is
    * the caller's contract violation (counts would go negative — such
    * groups are dropped rather than published as nonsense).
    *
    * Exactly-once on replay is keyed on `batchId` (the [[graft.streaming.AggStream]]
    * discipline — monotone per sink, NOT a data watermark: CDC batches
    * routinely carry old keys): a batch at or below the state's
    * `__b` high-water no-ops. Publication is the same OCC snapshot
    * replace as every state fold here. Returns whether the batch
    * applied (false = replay).
    *
    * Sums accumulate in the column's NATIVE family — integral sums
    * stay LongType exactly like [[mergeBatch]]'s (a long count rolled
    * up in floating point would drift past 2⁵³), doubles stay double,
    * decimals keep their widened decimal type.
    *
    * CONTRACT BOUNDARY — abelian measures only. Count and sum form a
    * group (every retraction has an inverse), so the fold never needs
    * the table. min/max/distinct do NOT: retracting the current
    * minimum leaves "second-smallest" unanswerable from state alone,
    * so a retractable min/max/distinct needs either a rescan of the
    * churned groups against the merged table (cost ∝ those groups'
    * rows — the caller can compute it from
    * [[AtomicIncrement.MergeResult.upserts]] + the post-merge
    * [[AtomicIncrement.readKeyedMayContain]] locality read) or sketch
    * state with deletion support (a counting HLL for distinct). This
    * fold deliberately refuses to fake them; ask only for count/sum
    * here and derive ratios at read time.
    */
  def mergeCdcBatch(plus: DataFrame, minus: DataFrame, sink: String,
      keys: Seq[String], sumCols: Seq[String], batchId: Long): Boolean = {
    val spark = plus.sparkSession
    val (version, priorFiles) = AtomicIncrement.snapshot(spark, sink)
    val prior =
      if (priorFiles.isEmpty) None else Some(readState(spark, sink))
    // the bootstrap fold (no committed state yet) always applies — a
    // bootstrap conventionally sits at batchId −1 so the stream's own
    // ids can start at 0 without colliding with it
    val last = prior.map(st =>
      st.agg(max("__b")).head().getLong(0)).getOrElse(Long.MinValue)
    if (prior.nonEmpty && batchId <= last) return false
    def signed(df: DataFrame, sign: Int) = {
      // the all-null-group coalesce zero in the column's NATIVE sum
      // family, so an integer sum stays integral through the fold
      // (parity with mergeBatch) instead of silently widening to
      // double and drifting at 2⁵³-scale totals
      import org.apache.spark.sql.types._
      def zeroOf(c: String) = df.schema.fields
        .find(_.name.equalsIgnoreCase(c)).map(_.dataType) match {
          case Some(ByteType | ShortType | IntegerType | LongType) => lit(0L)
          case Some(d: DecimalType) =>
            lit(java.math.BigDecimal.ZERO).cast(d)
          case _ => lit(0.0)
        }
      df.groupBy(keys.map(col): _*).agg(
        (count(lit(1)) * sign).as("__n"),
        sumCols.map(c =>
          (coalesce(sum(col(c)), zeroOf(c)) * sign).as(s"sum_$c")): _*)
    }
    val delta = signed(plus, 1).unionByName(signed(minus, -1))
    val merged = prior.map(_.drop("__b").unionByName(delta))
      .getOrElse(delta)
      .groupBy(keys.map(col): _*).agg(
        sum("__n").as("__n"),
        sumCols.map(c => sum(s"sum_$c").as(s"sum_$c")): _*)
      .filter(col("__n") > 0)
      .withColumn("__b", lit(batchId))
    AtomicIncrement.replaceSnapshot(merged, sink, version)
    true
  }

  /** Run a query whose plumbing needs a scratch atomic sink, then
    * reclaim the sink DETERMINISTICALLY: the output (small by
    * construction — these queries end in an aggregate of at most a
    * few rows) is materialized, the scratch directory deleted, and
    * the rows re-wrapped as a local frame. Without this every
    * bench/scale invocation stranded a fresh multi-copy temp sink on
    * disk — unbounded accumulation across repeated runs.
    */
  private[operators] def withScratchSink(
      spark: org.apache.spark.sql.SparkSession,
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

    // The STRING-watermark twin of q_read_pruned (round 13): the sink
    // is watermarked by a monotone string key (the reference's
    // GUID/ISO-string incremental pulls), so BOTH new string paths
    // carry the oracle row — the replay must append 0 THROUGH the
    // manifest's byte-ordered string max (a wrong byte-order max
    // re-appends rows and the count hash-mismatches), and the
    // consumer read is readCommittedAboveStr, whose `pruned` flag
    // pins that string-interval skipping ENGAGED. Fixed-width zero
    // padding makes byte order ≡ key order, so the oracle can derive
    // the same strings in SQL.
    "q_read_pruned_str" -> QueryDef(
      (s, dir) => withScratchSink(s, "graft_skipstr") { sink =>
        val o = table(s, dir, "orders").select(
          concat(lit("o-"),
            lpad(col("o_orderkey").cast("string"), 12, "0")).as("okey"),
          col("o_totalprice"))
        val mxk = table(s, dir, "orders")
          .agg(max("o_orderkey")).head().getLong(0)
        def k(v: Long) = "o-" + "%012d".format(v)
        var lo = ""
        for (hi <- Seq(k(mxk / 3), k(2 * mxk / 3), k(mxk))) {
          AtomicIncrement.appendIncrementAtomic(
            o.filter(col("okey") > lo && col("okey") <= hi), sink, "okey")
          lo = hi
        }
        // replay rides the manifest's string watermark: 0 fresh rows
        val replay = AtomicIncrement.appendIncrementAtomic(o, sink, "okey")
        val cutS = k(2 * mxk / 3)
        val pruned = AtomicIncrement.readCommittedAboveStr(
          s, sink, "okey", cutS)
        val engaged = replay == 0 && pruned.inputFiles.length <
          AtomicIncrement.committedFiles(s, sink).size
        pruned.filter(col("okey") > cutS)
          .agg(count(lit(1)).as("n"), min("okey").as("k_min"),
            round(sum("o_totalprice"), 2).as("sum_price"))
          .withColumn("pruned", lit(engaged))
      },
      """WITH cut AS (SELECT 2 * max(o_orderkey) // 3 AS c FROM orders)
        |SELECT count(*) AS n,
        |  'o-' || lpad(CAST(min(o_orderkey) AS VARCHAR), 12, '0') AS k_min,
        |  round(sum(o_totalprice), 2) AS sum_price, TRUE AS pruned
        |FROM orders, cut WHERE o_orderkey > c""".stripMargin),

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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // The OPTIMIZE path under the oracle gate: three loads whose key
    // sets INTERLEAVE (k % 3 == batch), so every file's key interval
    // spans the whole domain and nothing can prune — then
    // compactClustered re-ranges the table on the key and the same
    // above-the-cut read must skip files again. `clustered` pins both
    // halves: pruning was impossible before (a fixture regression to
    // accidentally-clustered loads would flip it) and engaged after.
    // The oracle is the plain aggregate — clustering must be invisible
    // to content.
    "q_optimize_cluster" -> QueryDef(
      (s, dir) => withScratchSink(s, "graft_optcluster") { sink =>
        val o = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_totalprice"))
        for (r <- 0L to 2L)
          AtomicIncrement.appendIncrementAtomic(
            o.filter(col("o_orderkey") % 3 === r)
              .withColumn("b", lit(r)),
            sink, "b", extraStatsCols = Seq("o_orderkey"))
        val mx = o.agg(max("o_orderkey")).head().getLong(0)
        val cut = 2 * mx / 3
        def files(df: org.apache.spark.sql.DataFrame) =
          df.inputFiles.length
        val total = AtomicIncrement.committedFiles(s, sink).size
        val beforePruned = files(AtomicIncrement.readCommittedAbove(
          s, sink, "o_orderkey", cut)) < total
        AtomicIncrement.compactClustered(s, sink, Seq("o_orderkey"),
          numFiles = 6)
        val prunedRead = AtomicIncrement.readCommittedAbove(
          s, sink, "o_orderkey", cut)
        val engaged = !beforePruned && files(prunedRead) <
          AtomicIncrement.committedFiles(s, sink).size
        prunedRead.filter(col("o_orderkey") > cut)
          .agg(count(lit(1)).as("n"),
            sum("o_orderkey").as("key_sum"),
            round(sum("o_totalprice"), 2).as("price_sum"))
          .withColumn("clustered", lit(engaged))
      },
      """SELECT count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  round(sum(o_totalprice), 2) AS price_sum, TRUE AS clustered
        |FROM orders
        |WHERE o_orderkey > 2 * (SELECT max(o_orderkey) FROM orders) // 3
        |""".stripMargin),

    // The RETRACTION fold under the oracle gate: the rollup
    // initializes from the base load, then the q_merge_upsert change
    // feed moves it by Σ(after-images) − Σ(before-images) — one
    // churn-sized aggregate, never a rescan. The oracle aggregates the
    // SQL-resolved final table in one pass, so a wrong sign, a
    // double-counted update (its before-image not retracted), or a
    // surviving deleted row's contribution all hash-mismatch. The 'X'
    // group exists ONLY through the delta — a fold that ignores new
    // groups drops it.
    "q_incr_agg_cdc" -> QueryDef(
      (s, dir) => withScratchSink(s, "graft_cdcagg") { sink =>
        val o = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        mergeCdcBatch(o, o.limit(0), sink,
          Seq("o_orderstatus"), Seq("o_totalprice"), 0L)
        val mx = o.agg(max("o_orderkey")).head().getLong(0)
        val cut = 2 * mx / 3
        val hot = o.filter(col("o_orderkey") > cut)
        val plus = hot.filter(col("o_orderkey") % 10 === 0)
          .select(lit("X").as("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"))
        val minus = hot.filter(
          col("o_orderkey") % 10 === 0 || col("o_orderkey") % 10 === 7)
        mergeCdcBatch(plus, minus, sink,
          Seq("o_orderstatus"), Seq("o_totalprice"), 1L)
        readState(s, sink)
          .select(col("o_orderstatus"), col("__n").as("n"),
            round(col("sum_o_totalprice"), 2).as("sum_price"),
            round(col("sum_o_totalprice") / col("__n"), 6).as("avg_price"))
          .orderBy("o_orderstatus")
      },
      """WITH cut AS (SELECT 2 * max(o_orderkey) // 3 AS c FROM orders),
        |final AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders, cut
        |  WHERE NOT (o_orderkey > c AND o_orderkey % 10 IN (0, 7))
        |  UNION ALL
        |  SELECT 'X', o_totalprice + 100 FROM orders, cut
        |  WHERE o_orderkey > c AND o_orderkey % 10 = 0)
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  round(sum(o_totalprice) / count(*), 6) AS avg_price
        |FROM final GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin))
}
