package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read CDC resolution: a change feed (inserts, updates,
  * deletes — each row stamped with a per-key monotone version) folds
  * to the current table state by keeping the LATEST version per key
  * and dropping keys whose latest change is a delete. This is the
  * read-side half of a lakehouse MERGE: the feed appends cheaply
  * (e.g. through `AtomicIncrement`), and the view resolves at read
  * time with ONE shuffle on the key and a rank-1 window —
  * WindowGroupLimit keeps per-partition state at one row per key, so
  * the resolve scales with the key count, not the change count.
  * Version ties are broken by preferring the delete (a same-version
  * upsert+delete resolves to deleted — the conservative read); the
  * caller owns version monotonicity per key, as in any CDC log.
  */
object Cdc {

  def latestView(changes: DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: String): DataFrame =
    latestViewWithDeletes(changes, keyCols, versionCol, deleteCol)
      .filter(!col(deleteCol))

  /** [[latestView]] keeping the winning DELETE rows (`deleteCol`
    * intact): one surviving change per key, delete wins version ties.
    * This is the within-batch resolve a MERGE consumes — it must see
    * the winning deletes to take rows down, where the read-side view
    * above only wants the survivors.
    */
  def latestViewWithDeletes(changes: DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(deleteCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Type-2 (SCD2) history view of the same feed: each non-delete
    * change becomes a validity interval `[version, next_version)` —
    * `valid_to` null while current. A delete closes the prior
    * interval (its version becomes that row's `valid_to`) and emits
    * no row itself. Same single key-shuffle + window shape as
    * [[latestView]]; versions must be distinct per key (ties make the
    * interval chain ambiguous — the caller owns the CDC log's order).
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol))
    changes.withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(!col(deleteCol))
      .withColumnRenamed(versionCol, "valid_from")
      .drop(deleteCol)
  }

  private def asChange(df: DataFrame, v: Int, del: Boolean,
      status: Column, price: Column): DataFrame =
    df.select(col("o_orderkey"), status.as("o_orderstatus"),
      price.as("o_totalprice"), lit(v).as("v"), lit(del).as("del"))

  def defs: Map[String, QueryDef] = Map(
    // The resolve under the oracle gate: orders as the base load,
    // every 10th key re-stated by an update, every 100th deleted —
    // the oracle replays the same feed and rank, so a wrong winner,
    // a surviving deleted key, or a dropped never-changed key all
    // hash-mismatch.
    "q_cdc_upsert" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val feed = asChange(o, 0, del = false,
            col("o_orderstatus"), col("o_totalprice"))
          .unionByName(asChange(o.filter(col("o_orderkey") % 10 === 0),
            1, del = false, lit("X"), col("o_totalprice") + 100))
          .unionByName(asChange(o.filter(col("o_orderkey") % 100 === 0),
            2, del = true, col("o_orderstatus"), col("o_totalprice")))
        latestView(feed, Seq("o_orderkey"), "v", "del")
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice"), 2).as("price"))
          .orderBy("o_orderkey")
      },
      """WITH feed AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    0 AS v, FALSE AS del FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'X', o_totalprice + 100, 1, FALSE
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 2, TRUE
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |latest AS (
        |  SELECT * FROM feed
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY v DESC, del DESC) = 1)
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM latest WHERE NOT del
        |ORDER BY o_orderkey""".stripMargin),

    // The MATERIALIZED half of the CDC story: where q_cdc_upsert
    // resolves the feed at read time, this folds it into the table
    // with AtomicIncrement.mergeAtomic — a copy-on-write MERGE that
    // rewrites ONLY the files whose key interval intersects the churn.
    // The base loads as three orderkey-range increments (disjoint
    // per-file key stats by construction); the change batch touches
    // only keys above the second cut, so the first two batches' files
    // must carry into the new manifest verbatim — `pruned` pins that
    // (a regression to rewrite-everything flips it and the oracle
    // hash-mismatches). The oracle replays the merge in SQL: base
    // minus churned keys, union the after-images.
    "q_merge_upsert" -> QueryDef(
      (s, dir) => IncrementalAgg.withScratchSink(s, "graft_merge") { sink =>
        val o = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val mx = o.agg(max("o_orderkey")).head().getLong(0)
        var lo = Long.MinValue
        for (hi <- Seq(mx / 3, 2 * mx / 3, mx)) {
          AtomicIncrement.appendIncrementAtomic(
            o.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi),
            sink, "o_orderkey")
          lo = hi
        }
        val cut = 2 * mx / 3
        val hot = o.filter(col("o_orderkey") > cut)
        val changes = hot.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(false).as("del"))
          .unionByName(hot.filter(col("o_orderkey") % 10 === 7)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), lit(true).as("del")))
        val res = AtomicIncrement.mergeAtomic(changes, sink,
          "o_orderkey", "del")
        // the output must end in a SMALL aggregate (the scratch-sink
        // pattern materializes it on the driver): per-status count,
        // key checksum and price sum over the merged table still
        // discriminate a wrong winner, a surviving delete, or a
        // dropped untouched row — each moves some group's triple
        AtomicIncrement.readCommitted(s, sink)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum("o_orderkey").as("key_sum"),
            round(sum("o_totalprice"), 2).as("price_sum"))
          .withColumn("pruned", lit(res.carried > 0))
          .orderBy("o_orderstatus")
      },
      """WITH cut AS (SELECT 2 * max(o_orderkey) // 3 AS c FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders, cut
        |  WHERE NOT (o_orderkey > c AND o_orderkey % 10 IN (0, 7))
        |  UNION ALL
        |  SELECT o_orderkey, 'X', o_totalprice + 100
        |  FROM orders, cut WHERE o_orderkey > c AND o_orderkey % 10 = 0)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  round(sum(o_totalprice), 2) AS price_sum, TRUE AS pruned
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    // The string-keyed MERGE under the oracle gate — the reference's
    // conformed keys are UUID strings (tim_guid,
    // datasets/create_yougile_dataset.ipynb cell 9; plugin_id,
    // create_logs_dataset.ipynb cell 5), so the copy-on-write path
    // must prune and rewrite on a STRING key, not just surrogate
    // longs. The base loads as three orderkey-range increments whose
    // UUID-shaped guid (fixed prefix + zero-padded numeric tail —
    // byte order ≡ key order) is recorded as string interval stats;
    // the change batch churns only guids above the second cut, so the
    // first two batches' files must carry verbatim — `pruned` pins
    // that string-interval pruning ENGAGED. The oracle derives the
    // same guid in SQL and replays the merge; `guid_min` surfaces the
    // string key itself in the compared output.
    "q_merge_upsert_str" -> QueryDef(
      (s, dir) => IncrementalAgg.withScratchSink(s, "graft_mergestr") { sink =>
        val o = table(s, dir, "orders").select(
          concat(lit("00000000-0000-4000-8000-"),
            lpad(col("o_orderkey").cast("string"), 12, "0")).as("o_guid"),
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val mx = o.agg(max("o_orderkey")).head().getLong(0)
        var lo = Long.MinValue
        for (hi <- Seq(mx / 3, 2 * mx / 3, mx)) {
          AtomicIncrement.appendIncrementAtomic(
            o.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi),
            sink, "o_orderkey", extraStatsCols = Seq("o_guid"))
          lo = hi
        }
        val cut = 2 * mx / 3
        val hot = o.filter(col("o_orderkey") > cut)
        val changes = hot.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_guid"), col("o_orderkey"),
            lit("X").as("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(false).as("del"))
          .unionByName(hot.filter(col("o_orderkey") % 10 === 7)
            .select(col("o_guid"), col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), lit(true).as("del")))
        val res = AtomicIncrement.mergeAtomic(changes, sink, "o_guid", "del")
        AtomicIncrement.readCommitted(s, sink)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum("o_orderkey").as("key_sum"),
            min("o_guid").as("guid_min"),
            round(sum("o_totalprice"), 2).as("price_sum"))
          .withColumn("pruned", lit(res.carried > 0))
          .orderBy("o_orderstatus")
      },
      """WITH cut AS (SELECT 2 * max(o_orderkey) // 3 AS c FROM orders),
        |base AS (
        |  SELECT '00000000-0000-4000-8000-' ||
        |      lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS o_guid,
        |    o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |merged AS (
        |  SELECT o_guid, o_orderkey, o_orderstatus, o_totalprice
        |  FROM base, cut
        |  WHERE NOT (o_orderkey > c AND o_orderkey % 10 IN (0, 7))
        |  UNION ALL
        |  SELECT o_guid, o_orderkey, 'X', o_totalprice + 100
        |  FROM base, cut WHERE o_orderkey > c AND o_orderkey % 10 = 0)
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  min(o_guid) AS guid_min,
        |  round(sum(o_totalprice), 2) AS price_sum, TRUE AS pruned
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    // The MATERIALIZED type-2 history (round 13): where q_cdc_history
    // resolves intervals at read time, this folds a change batch into
    // a copy-on-write SCD2 table — churned keys' open rows CLOSE
    // (valid_to := incoming version), updates append a new open row,
    // deletes close without appending, and only churn-intersecting
    // files rewrite (`pruned` pins the carried files). The oracle
    // replays the interval algebra per row class and aggregates by
    // (status, currentness) — a row closed twice, an open row lost,
    // or a delete that appended all move some group.
    "q_merge_scd2" -> QueryDef(
      (s, dir) => IncrementalAgg.withScratchSink(s, "graft_scd2") { sink =>
        val o = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          lit(0L).as("valid_from"),
          lit(null).cast("long").as("valid_to"))
        val mx = o.agg(max("o_orderkey")).head().getLong(0)
        var lo = Long.MinValue
        for (hi <- Seq(mx / 3, 2 * mx / 3, mx)) {
          AtomicIncrement.appendIncrementAtomic(
            o.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi),
            sink, "o_orderkey")
          lo = hi
        }
        val cut = 2 * mx / 3
        val hot = o.filter(col("o_orderkey") > cut)
        val changes = hot.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(1L).as("v"), lit(false).as("del"))
          .unionByName(hot.filter(col("o_orderkey") % 10 === 7)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"), lit(1L).as("v"), lit(true).as("del")))
        val res = AtomicIncrement.mergeScd2Atomic(changes, sink,
          "o_orderkey", "v", "del")
        AtomicIncrement.readCommitted(s, sink)
          .groupBy(col("o_orderstatus"),
            col("valid_to").isNull.as("current"))
          .agg(count(lit(1)).as("n"),
            sum("o_orderkey").as("key_sum"),
            round(sum("o_totalprice"), 2).as("price_sum"))
          .withColumn("pruned", lit(res.carried > 0))
          .orderBy("o_orderstatus", "current")
      },
      """WITH cut AS (SELECT 2 * max(o_orderkey) // 3 AS c FROM orders),
        |hist AS (
        |  -- untouched keys: still the open base row
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    TRUE AS current FROM orders, cut
        |  WHERE NOT (o_orderkey > c AND o_orderkey % 10 IN (0, 7))
        |  UNION ALL
        |  -- churned keys: the base row closed at version 1
        |  SELECT o_orderstatus, o_orderkey, o_totalprice, FALSE
        |  FROM orders, cut
        |  WHERE o_orderkey > c AND o_orderkey % 10 IN (0, 7)
        |  UNION ALL
        |  -- updates: the new open version (deletes append nothing)
        |  SELECT 'X', o_orderkey, o_totalprice + 100, TRUE
        |  FROM orders, cut WHERE o_orderkey > c AND o_orderkey % 10 = 0)
        |SELECT o_orderstatus, current, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  round(sum(o_totalprice), 2) AS price_sum, TRUE AS pruned
        |FROM hist GROUP BY o_orderstatus, current
        |ORDER BY o_orderstatus, current""".stripMargin),

    // The history view over the same feed: intervals chain per key,
    // deletes close the last interval without emitting a row.
    "q_cdc_history" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        def ch(df: DataFrame, v: Int, del: Boolean, status: Column) =
          df.select(col("o_orderkey"), status.as("o_orderstatus"),
            lit(v).as("v"), lit(del).as("del"))
        val feed = ch(o, 0, del = false, col("o_orderstatus"))
          .unionByName(ch(o.filter(col("o_orderkey") % 10 === 0),
            1, del = false, lit("X")))
          .unionByName(ch(o.filter(col("o_orderkey") % 100 === 0),
            2, del = true, col("o_orderstatus")))
        scd2History(feed, Seq("o_orderkey"), "v", "del")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("valid_from"), col("valid_to"))
          .orderBy("o_orderkey", "valid_from")
      },
      """WITH feed AS (
        |  SELECT o_orderkey, o_orderstatus, 0 AS v, FALSE AS del FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'X', 1, FALSE FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, 2, TRUE
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderkey, o_orderstatus, v AS valid_from, valid_to FROM (
        |  SELECT *, lead(v) OVER (PARTITION BY o_orderkey ORDER BY v) AS valid_to
        |  FROM feed)
        |WHERE NOT del ORDER BY o_orderkey, valid_from""".stripMargin))
}
