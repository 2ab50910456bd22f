package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StringType}

/** The reference's relational core (SURVEY.md §2.3-2.5, §2.7):
  * projections, filters, equi-join family, hash aggregates, argmax.
  * Every query is a lazy Catalyst plan — filters and projections push
  * into the parquet scan, dimensions broadcast, aggregates run
  * partial→final. Output is deterministically ordered so the driver's
  * hash compare and the bench both see stable results.
  */
object Relational {

  def defs: Map[String, QueryDef] = Map(

    // A2/A6: grouped aggregation, TPC-H Q1 shape. Map-side partial agg
    // then 8-group final — shuffles 8 rows regardless of input size.
    "q1_agg" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // P1/P4: projection + rename (reference: select/rename bulk ops).
    "q_project_rename" -> QueryDef(
      (s, dir) => table(s, dir, "customer")
        .select(
          col("c_custkey").as("customer_id"),
          col("c_name").as("customer_name"),
          col("c_mktsegment").as("segment"))
        .orderBy("customer_id"),
      """SELECT c_custkey AS customer_id, c_name AS customer_name,
        |  c_mktsegment AS segment
        |FROM customer ORDER BY customer_id""".stripMargin),

    // P5: prefix filter — pushed to the parquet scan as StartsWith.
    "q_filter_prefix" -> QueryDef(
      (s, dir) => table(s, dir, "part")
        .filter(col("p_type").startsWith("STANDARD"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey"),
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE 'STANDARD%' ORDER BY p_partkey""".stripMargin),

    // P6: membership filter (reference: dst.isin(allowed)).
    "q_filter_isin" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority"),
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // P8: case-insensitive regex contains, null-safe (pandas
    // str.contains(case=False, na=False)).
    "q_filter_rlike_ci" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .filter(coalesce(col("event_type").rlike("(?iu)(SIGN|PURCH)"), lit(false)))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      """SELECT event_type, count(*) AS n FROM events
        |WHERE regexp_matches(event_type, '(?i)(SIGN|PURCH)')
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // P9: boolean-flag conjunction split (reference bim/designers split).
    "q_filter_flags" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("l_linestatus"),
      """SELECT l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    // J1/J4: left equi-join with a dimension (the reference's
    // universal join shape). No broadcast hint: customer grows with
    // scale factor, so a forced hint would pin a multi-TB build side
    // at the 100 TB target — the planner auto-broadcasts while the dim
    // fits and AQE re-plans at runtime otherwise.
    "q_join_left" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        o.join(c, o("o_custkey") === c("c_custkey"), "left")
          .groupBy(coalesce(col("c_mktsegment"), lit("Нет данных")).as("segment"))
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("segment")
      },
      """SELECT coalesce(c_mktsegment, 'Нет данных') AS segment,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY segment""".stripMargin),

    // J11: snowflake chain customer→nation→region with dim filter —
    // two broadcast joins, filter pushed below the joins by Catalyst.
    "q_join_snowflake" -> QueryDef(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_customers"),
            round(avg("c_acctbal"), 4).as("avg_bal"))
          .orderBy("r_name", "n_name")
      },
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA','EUROPE')
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),

    // P7: anti-join — customers with no orders (reference: unmapped-key
    // extraction before sheet writeback).
    "q_join_anti" -> QueryDef(
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin),

    // P6-as-join: semi-join — suppliers that appear in lineitem.
    "q_join_semi" -> QueryDef(
      (s, dir) => {
        val sup = table(s, dir, "supplier")
        val li = table(s, dir, "lineitem").select(col("l_suppkey"))
        sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
        |ORDER BY s_suppkey""".stripMargin),

    // J8: equi-join after lossy key coercion — both sides try_cast to
    // nullable long (pandas Int64 semantics: garbage → NULL, and NULL
    // keys never match; reference: create_scripts_dataset.ipynb cell
    // 10). Keys are synthesized from props digits so some rows carry
    // unparseable keys.
    "q_join_trycast" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(
            regexp_extract(col("props"), "([0-9]+)", 1).try_cast(LongType).as("k"),
            col("value"))
        val c = table(s, dir, "customer")
          .select(col("c_custkey").cast(StringType).try_cast(LongType).as("k"),
            col("c_mktsegment"))
        e.join(c, Seq("k"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total
        |FROM (SELECT TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k, value
        |      FROM events) e
        |JOIN (SELECT TRY_CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS k, c_mktsegment
        |      FROM customer) c USING (k)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // A1: scalar max (high-watermark read, reference S9/K5).
    "q_max_scalar" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .agg(max("o_orderdate").as("max_date"),
          max("o_orderkey").as("max_key")),
      "SELECT max(o_orderdate) AS max_date, max(o_orderkey) AS max_key FROM orders"),

    // A4: argmax / top-1 per group (reference: branch with max LOC).
    // max_by avoids the window shuffle+sort — single hash aggregate.
    "q_argmax" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("top_order"),
          round(max("o_totalprice"), 2).as("top_price"))
        .orderBy("o_custkey"),
      """SELECT o_custkey, o_orderkey AS top_order,
        |  round(o_totalprice, 2) AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin),

    // A5: distinct-set collect, canonicalized to a sorted joined string
    // so the hash compare is order-independent.
    "q_collect_set" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .groupBy("user_id")
        .agg(
          array_join(array_sort(collect_set("event_type")), ",").as("types"),
          countDistinct("event_type").as("n_types"))
        .orderBy("user_id"),
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // §2.7 extension: window function (running aggregate per key) —
    // single shuffle on user_id, sort within partition.
    "q_window_running" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        table(s, dir, "events")
          .withColumn("running_value", round(sum("value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .withColumn("rn", row_number().over(w))
          .select("event_id", "user_id", "rn", "running_value")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
        |  row_number() OVER w AS rn,
        |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin),

    // §2.7 extension: event-time RANGE frame — the trailing-hour
    // activity count/sum per user. A range frame bounds the window by
    // ORDER-VALUE distance (epoch micros), not row count, so bursts
    // and quiet stretches see the same one-hour horizon; both engines
    // define peers identically (all rows within the interval), which
    // the oracle replays on epoch_us. Never emits raw ts (micros vs
    // nanos — see the Tables scaladoc).
    "q_window_trailing" -> QueryDef(
      (s, dir) => {
        val hourUs = 3600L * 1000000
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-hourUs, 0)
        table(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("v_1h", round(sum("value").over(w), 2))
          .select("event_id", "user_id", "n_1h", "v_1h")
          .orderBy("event_id")
      },
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(sum(value) OVER w, 2) AS v_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),

    // §2.5 extension: exact interpolated percentiles (Spark
    // `percentile` ≡ DuckDB `quantile_cont` — same linear
    // interpolation definition).
    // Per-group z-score outlier flagging: group stats are one
    // bounded (|groups| rows) aggregate broadcast back over the fact
    // scan — two passes, both map-side/map-only, no row-count-sized
    // state. The 3σ cut and the 4-dp z both replay across engines
    // (events.value has real >3σ mass; nearest row sits ~1e-2 from
    // the cut, far beyond last-ulp stats drift).
    "q_outliers" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "events")
        val stats = e.groupBy("event_type")
          .agg(avg("value").as("mu"), stddev_pop("value").as("sd"))
        e.join(broadcast(stats), "event_type")
          .withColumn("z", (col("value") - col("mu")) / col("sd"))
          .filter(abs(col("z")) > 3)
          .select(col("event_id"), col("event_type"),
            round(col("value"), 2).as("value"), round(col("z"), 4).as("z"))
          .orderBy("event_id")
      },
      """WITH s AS (SELECT event_type, avg(value) AS mu,
        |    stddev_pop(value) AS sd
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, round(value, 2) AS value,
        |  round((value - mu) / sd, 4) AS z
        |FROM events JOIN s USING (event_type)
        |WHERE abs((value - mu) / sd) > 3
        |ORDER BY event_id""".stripMargin),

    "q_percentile" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("price_p99"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS p95,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // §2.5 extension: distinct-count sketch (HyperLogLog++). The raw
    // estimate is algorithm-specific (no external engine replays HLL
    // registers), so the query emits the exact count plus the
    // PROPERTY the sketch guarantees — estimate within ±5% of exact —
    // and the oracle asserts that property must hold (`within_bound`
    // literally true per group). An HLL drift past the bound now
    // hash-mismatches instead of hiding behind a rows-only check;
    // RelationalSpec additionally pins the estimate's determinism.
    "q_approx_distinct" -> QueryDef(
      (s, dir) => table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          (abs(approx_count_distinct("l_partkey", 0.02) -
            countDistinct(col("l_partkey"))).cast("double") /
            countDistinct(col("l_partkey")) <= 0.05).as("within_bound"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  true AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // §2.5 extension: rollup (grouping sets) over the snowflake.
    "q_rollup" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // Full cube over the same two dims as q_rollup — all four
    // grouping sets, null margins ordered identically in both engines
    // (Spark ASC is NULLS FIRST, DuckDB's isn't: pinned explicitly).
    "q_cube" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    // Top-k per group: rank window + filter. Catalyst's
    // InferWindowGroupLimit rewrites the rank<=k filter into a
    // WindowGroupLimit that keeps only k rows per key per partition
    // BEFORE the shuffle — map-side top-k, so the sort never sees the
    // full group. Tie-broken on the unique key for determinism.
    "q_topk_group" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        table(s, dir, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"))
          .orderBy("o_orderpriority", "rk")
      },
      """SELECT o_orderpriority, rk, o_orderkey, round(o_totalprice, 2) AS price
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin),

    // Pivot with an explicit value list: one partial-agg shuffle, no
    // distinct-values pre-pass on the driver (an unlisted pivot scans
    // the column twice — never do that at scale).
    "q_pivot" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("user_id"),
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Unpivot/melt (wide → long): generated row expansion, no shuffle
    // at all — the narrow-transform twin of pivot.
    "q_unpivot" -> QueryDef(
      (s, dir) => table(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_totalprice").cast("double").as("totalprice"),
          col("o_custkey").cast("double").as("custkey"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("totalprice"), col("custkey")), "metric", "value")
        .orderBy("o_orderkey", "metric"),
      """SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
        |FROM orders
        |ORDER BY o_orderkey, metric""".stripMargin)
  )
}
