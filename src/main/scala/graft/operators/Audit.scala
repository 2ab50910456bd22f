package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-reconciliation audits an incremental pipeline needs around
  * its sinks: snapshot-to-snapshot diff (what changed between two
  * published versions — the verification step behind
  * [[AtomicIncrement]]/[[Cdc]] upgrades) and referential-integrity
  * checks (orphan facts after a partial load — the failure mode the
  * reference's full-replace JDBC loads silently tolerate, see
  * etl-pipeline-old/datasets/create_projectsync_dataset.ipynb
  * cell 17).
  */
object Audit {

  /** Row-level diff of two snapshots on a key: `added` (key only in
    * `next`), `removed` (only in `prev`), `changed` (both, any
    * compared column differs, null-safely). Unchanged rows are NOT
    * emitted — at 100 TB the diff output is proportional to the
    * churn, never the table; one full outer join on the key (both
    * sides shuffle once; AQE broadcasts a small side).
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    val p = prev.select((keyCol +: compareCols).map(c =>
      col(c).as("p_" + c)): _*)
    val n = next.select((keyCol +: compareCols).map(c =>
      col(c).as("n_" + c)): _*)
    val changed = compareCols
      .map(c => !(col("p_" + c) <=> col("n_" + c)))
      .reduce(_ || _)
    p.join(n, col("p_" + keyCol) === col("n_" + keyCol), "full_outer")
      .withColumn("change",
        when(col("p_" + keyCol).isNull, "added")
          .when(col("n_" + keyCol).isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("p_" + keyCol), col("n_" + keyCol)).as(keyCol),
        col("change"))
  }

  /** Orphan count per declared foreign key: facts whose key resolves
    * to no dimension row. Each check is one anti-join — dimension
    * sides broadcast when small; null FKs are not orphans (SQL
    * semantics: a null FK asserts nothing).
    */
  def fkOrphans(fact: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String, label: String): DataFrame =
    fact.filter(col(fkCol).isNotNull)
      .join(dim, fact(fkCol) === dim(pkCol), "left_anti")
      .agg(lit(label).as("fk"), count(lit(1)).as("orphans"))

  /** Declarative data-quality expectations evaluated in ONE aggregate
    * pass (the Deequ/Great-Expectations shape): each check contributes
    * an observed metric (aggregate Column, cast to double) and a
    * passed predicate over the same aggregate row, and the single agg
    * row is exploded into one (rule, observed, passed) report row per
    * check. At 100 TB this is what makes an expectation suite
    * runnable at all — N checks cost one scan with map-side partial
    * aggregation, not N scans; a distinct-count check is the only
    * two-phase aggregate in the plan.
    *
    * checks: (rule name, observed aggregate, passed aggregate).
    */
  def expectations(df: DataFrame,
      checks: Seq[(String, Column, Column)]): DataFrame = {
    val aggCols = checks.zipWithIndex.flatMap { case ((_, obs, pass), i) =>
      Seq(obs.cast("double").as(s"__o$i"), pass.as(s"__p$i")) }
    val report = checks.zipWithIndex.map { case ((n, _, _), i) =>
      struct(lit(n).as("rule"), col(s"__o$i").as("observed"),
        col(s"__p$i").as("passed")) }
    df.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(report: _*)).as("e"))
      .select("e.*")
  }

  def defs: Map[String, QueryDef] = Map(
    // Diff two derived snapshots of orders: "prev" drops keys
    // divisible by 97 (those read as added), "next" drops keys
    // divisible by 101 (removed) and bumps totalprice on keys
    // divisible by 7 (changed). The oracle replays membership and the
    // null-safe column compare.
    "q_snapshot_diff" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val prev = o.filter(col("o_orderkey") % 97 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val next = o.filter(col("o_orderkey") % 101 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            col("o_orderstatus"))
        snapshotDiff(prev, next, "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
          .orderBy("o_orderkey")
      },
      """WITH prev AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderkey % 97 <> 0),
        |next AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderstatus FROM orders
        |  WHERE o_orderkey % 101 <> 0)
        |SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN p.o_orderkey IS NULL THEN 'added'
        |    WHEN n.o_orderkey IS NULL THEN 'removed'
        |    WHEN p.o_totalprice IS DISTINCT FROM n.o_totalprice
        |      OR p.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |    THEN 'changed' END AS change
        |FROM prev p FULL OUTER JOIN next n USING (o_orderkey)
        |WHERE CASE WHEN p.o_orderkey IS NULL THEN 'added'
        |    WHEN n.o_orderkey IS NULL THEN 'removed'
        |    WHEN p.o_totalprice IS DISTINCT FROM n.o_totalprice
        |      OR p.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |    THEN 'changed' END IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin),

    // Referential-integrity audit over the star: orphan counts for
    // three fact→dim edges, with damage injected per edge (dimension
    // subsets) so every count is nonzero and the anti-join direction
    // is provably right.
    "q_fk_audit" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val ord = table(s, dir, "orders")
        val cust = table(s, dir, "customer")
        val nat = table(s, dir, "nation")
        fkOrphans(li, "l_orderkey",
            ord.filter(col("o_orderkey") % 3 =!= 0), "o_orderkey",
            "lineitem.orderkey")
          .unionByName(fkOrphans(ord, "o_custkey",
            cust.filter(col("c_custkey") % 2 === 0), "c_custkey",
            "orders.custkey"))
          .unionByName(fkOrphans(cust, "c_nationkey",
            nat.filter(col("n_nationkey") < 20), "n_nationkey",
            "customer.nationkey"))
          .orderBy("fk")
      },
      """SELECT fk, orphans FROM (
        |  SELECT 'lineitem.orderkey' AS fk, count(*) AS orphans
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |      WHERE o_orderkey % 3 <> 0 AND o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'orders.custkey', count(*)
        |  FROM orders WHERE o_custkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM customer
        |      WHERE c_custkey % 2 = 0 AND c_custkey = o_custkey)
        |  UNION ALL
        |  SELECT 'customer.nationkey', count(*)
        |  FROM customer WHERE c_nationkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM nation
        |      WHERE n_nationkey < 20 AND n_nationkey = c_nationkey))
        |ORDER BY fk""".stripMargin),

    // Expectation suite over lineitem: completeness, key uniqueness,
    // range, set-membership, and sign checks — ONE aggregate pass. The
    // observed metric is always a violation count (0 = healthy), so a
    // failing rule reports how bad, not just that. The synthetic
    // corpus genuinely violates pk_unique (duplicate (orderkey,
    // linenumber) pairs), so the report proves the failure direction,
    // not just the happy path. The oracle replays every metric AND
    // every pass verdict from the same single-scan aggregate.
    "q_expectations" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        // l_linenumber < 10 (max 7), so orderkey*10+linenumber is an
        // injective encoding of the compound key — countDistinct over
        // one long beats a struct distinct at any scale
        val pk = col("l_orderkey") * 10 + col("l_linenumber")
        expectations(li, Seq(
          ("discount_in_range",
            count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)),
            count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)) === 0),
          ("pk_unique",
            count(lit(1)) - countDistinct(pk),
            count(lit(1)) - countDistinct(pk) === 0),
          ("price_nonnegative",
            count(when(col("l_extendedprice") < 0, 1)),
            count(when(col("l_extendedprice") < 0, 1)) === 0),
          ("quantity_in_range",
            count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)),
            count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)) === 0),
          ("returnflag_complete",
            count(when(col("l_returnflag").isNull, 1)),
            count(when(col("l_returnflag").isNull, 1)) === 0),
          ("returnflag_in_set",
            count(when(!col("l_returnflag").isin("A", "N", "R"), 1)),
            count(when(!col("l_returnflag").isin("A", "N", "R"), 1)) === 0),
          ("rows_nonempty", count(lit(1)), count(lit(1)) > 0),
          ("tax_in_range",
            count(when(col("l_tax") < 0 || col("l_tax") > 0.08, 1)),
            count(when(col("l_tax") < 0 || col("l_tax") > 0.08, 1)) === 0)))
          .orderBy("rule")
      },
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS disc_bad,
        |    count(*) - count(DISTINCT l_orderkey * 10 + l_linenumber) AS pk_dups,
        |    count(CASE WHEN l_extendedprice < 0 THEN 1 END) AS price_bad,
        |    count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS qty_bad,
        |    count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS rf_nulls,
        |    count(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END) AS set_bad,
        |    count(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 END) AS tax_bad
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'discount_in_range' AS rule, CAST(disc_bad AS DOUBLE) AS observed,
        |    disc_bad = 0 AS passed FROM m
        |  UNION ALL SELECT 'pk_unique', CAST(pk_dups AS DOUBLE), pk_dups = 0 FROM m
        |  UNION ALL SELECT 'price_nonnegative', CAST(price_bad AS DOUBLE), price_bad = 0 FROM m
        |  UNION ALL SELECT 'quantity_in_range', CAST(qty_bad AS DOUBLE), qty_bad = 0 FROM m
        |  UNION ALL SELECT 'returnflag_complete', CAST(rf_nulls AS DOUBLE), rf_nulls = 0 FROM m
        |  UNION ALL SELECT 'returnflag_in_set', CAST(set_bad AS DOUBLE), set_bad = 0 FROM m
        |  UNION ALL SELECT 'rows_nonempty', CAST(n AS DOUBLE), n > 0 FROM m
        |  UNION ALL SELECT 'tax_in_range', CAST(tax_bad AS DOUBLE), tax_bad = 0 FROM m)
        |ORDER BY rule""".stripMargin),

    // Expectation suite over the TEXT corpus — the data contract a
    // training pipeline asserts before any batch is admitted: rows
    // present, unique doc keys, no empty text, the n_chars metadata
    // column actually equal to length(text) (a stale-metadata break
    // silently skews every length-based quality gate), language codes
    // in the routing set, source populated. Same one-pass aggregate +
    // unpivot shape as q_expectations.
    "q_corpus_expectations" -> QueryDef(
      (s, dir) => {
        val d = table(s, dir, "documents")
        expectations(d, Seq(
          ("doc_id_unique",
            count(lit(1)) - countDistinct(col("doc_id")),
            count(lit(1)) - countDistinct(col("doc_id")) === 0),
          // explicit IS NULL arm: NULL NOT IN (...) is NULL, so without
          // it a missing language silently PASSES the routability gate
          ("lang_in_set",
            count(when(col("lang").isNull ||
              !col("lang").isin("en", "de", "es", "fr", "ru", "zh"), 1)),
            count(when(col("lang").isNull ||
              !col("lang").isin("en", "de", "es", "fr", "ru", "zh"), 1)) === 0),
          ("n_chars_consistent",
            count(when(col("n_chars") =!= length(col("text")), 1)),
            count(when(col("n_chars") =!= length(col("text")), 1)) === 0),
          ("rows_nonempty", count(lit(1)), count(lit(1)) > 0),
          ("source_complete",
            count(when(col("source").isNull || col("source") === "", 1)),
            count(when(col("source").isNull || col("source") === "", 1)) === 0),
          ("text_nonblank",
            count(when(col("text").isNull || trim(col("text")) === "", 1)),
            count(when(col("text").isNull || trim(col("text")) === "", 1)) === 0)))
          .orderBy("rule")
      },
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    count(*) - count(DISTINCT doc_id) AS pk_dups,
        |    count(CASE WHEN lang IS NULL
        |      OR lang NOT IN ('en','de','es','fr','ru','zh') THEN 1 END) AS lang_bad,
        |    count(CASE WHEN n_chars != length(text) THEN 1 END) AS nchars_bad,
        |    count(CASE WHEN source IS NULL OR source = '' THEN 1 END) AS src_bad,
        |    count(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 END) AS text_bad
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'doc_id_unique' AS rule, CAST(pk_dups AS DOUBLE) AS observed,
        |    pk_dups = 0 AS passed FROM m
        |  UNION ALL SELECT 'lang_in_set', CAST(lang_bad AS DOUBLE), lang_bad = 0 FROM m
        |  UNION ALL SELECT 'n_chars_consistent', CAST(nchars_bad AS DOUBLE), nchars_bad = 0 FROM m
        |  UNION ALL SELECT 'rows_nonempty', CAST(n AS DOUBLE), n > 0 FROM m
        |  UNION ALL SELECT 'source_complete', CAST(src_bad AS DOUBLE), src_bad = 0 FROM m
        |  UNION ALL SELECT 'text_nonblank', CAST(text_bad AS DOUBLE), text_bad = 0 FROM m)
        |ORDER BY rule""".stripMargin),

    // The embedding-table contract: uniform dimensionality (a single
    // short vector poisons every fdot in the ANN family with an
    // index-out-of-bounds or a silently-wrong score), finite elements
    // (one NaN propagates through any cosine into every ranking it
    // touches), unique vector keys, labels present and in the routing
    // range. Same aggregate+unpivot shape.
    "q_embedding_expectations" -> QueryDef(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        // explicit isnan on BOTH engines: Spark and DuckDB each treat
        // NaN = NaN as TRUE under their total orderings, so the IEEE
        // x != x idiom detects nothing in either
        val badElem = exists(col("embedding"), x => x.isNull || isnan(x))
        expectations(e, Seq(
          ("dim_uniform_64",
            count(when(size(col("embedding")) =!= 64, 1)),
            count(when(size(col("embedding")) =!= 64, 1)) === 0),
          ("elements_finite",
            count(when(badElem, 1)),
            count(when(badElem, 1)) === 0),
          ("label_in_range",
            count(when(col("label").isNull ||
              col("label") < 0 || col("label") > 9, 1)),
            count(when(col("label").isNull ||
              col("label") < 0 || col("label") > 9, 1)) === 0),
          ("rows_nonempty", count(lit(1)), count(lit(1)) > 0),
          ("vec_id_unique",
            count(lit(1)) - countDistinct(col("vec_id")),
            count(lit(1)) - countDistinct(col("vec_id")) === 0)))
          .orderBy("rule")
      },
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    count(CASE WHEN len(embedding) != 64 THEN 1 END) AS dim_bad,
        |    count(CASE WHEN len(list_filter(embedding,
        |      x -> x IS NULL OR isnan(x))) > 0 THEN 1 END) AS elem_bad,
        |    count(CASE WHEN label IS NULL OR label < 0 OR label > 9
        |      THEN 1 END) AS label_bad,
        |    count(*) - count(DISTINCT vec_id) AS pk_dups
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT 'dim_uniform_64' AS rule, CAST(dim_bad AS DOUBLE) AS observed,
        |    dim_bad = 0 AS passed FROM m
        |  UNION ALL SELECT 'elements_finite', CAST(elem_bad AS DOUBLE), elem_bad = 0 FROM m
        |  UNION ALL SELECT 'label_in_range', CAST(label_bad AS DOUBLE), label_bad = 0 FROM m
        |  UNION ALL SELECT 'rows_nonempty', CAST(n AS DOUBLE), n > 0 FROM m
        |  UNION ALL SELECT 'vec_id_unique', CAST(pk_dups AS DOUBLE), pk_dups = 0 FROM m)
        |ORDER BY rule""".stripMargin),

    // Temporal train/eval split leakage audit: split events at the
    // midpoint of the observed time range (exact integer-micros
    // arithmetic — deterministic on any engine, unlike an interpolated
    // median) and count entities active on BOTH sides. A per-user
    // boolean pair rides ONE group-by; at 100 TB this is one key
    // shuffle and a 4-cell answer. This harness's event stream has
    // every user active across both halves — leak_frac 1.0 — which is
    // precisely the answer that tells a pipeline author a TIME split
    // leaks users and an entity-hash split (q_split_assign) is needed.
    "q_split_leakage" -> QueryDef(
      (s, dir) => {
        val b = graft.functions.Functions.spreadScan(
          table(s, dir, "events"))
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        // `div`, not `/`: the Column `/` is double division, and a
        // fractional midpoint would compare differently than the
        // oracle's integer `//`
        val mid = broadcast(b.agg(
          expr("min(us) + (max(us) - min(us)) div 2").as("m")))
        b.crossJoin(mid)
          .groupBy("user_id")
          .agg(max(when(col("us") < col("m"), 1).otherwise(0)).as("tr"),
            max(when(col("us") >= col("m"), 1).otherwise(0)).as("ev"))
          .agg(sum("tr").cast("long").as("n_train_users"),
            sum("ev").cast("long").as("n_eval_users"),
            sum(col("tr") * col("ev")).cast("long").as("n_leaked"),
            round(sum(col("tr") * col("ev")) * lit(1.0) / sum("ev"), 4)
              .as("leak_frac"))
      },
      """WITH b AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |mid AS (SELECT min(us) + (max(us) - min(us)) // 2 AS m FROM b),
        |pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN us < m THEN 1 ELSE 0 END) AS tr,
        |    max(CASE WHEN us >= m THEN 1 ELSE 0 END) AS ev
        |  FROM b, mid GROUP BY 1)
        |SELECT CAST(sum(tr) AS BIGINT) AS n_train_users,
        |  CAST(sum(ev) AS BIGINT) AS n_eval_users,
        |  CAST(sum(tr * ev) AS BIGINT) AS n_leaked,
        |  round(sum(tr * ev) * 1.0 / sum(ev), 4) AS leak_frac
        |FROM pu""".stripMargin),

    // Population-stability-index drift between two corpus snapshots
    // (doc_id parity as the synthetic snapshot split): token-count
    // distributions over 8 fixed-width buckets scaled by the GLOBAL
    // max, Laplace-smoothed shares, per-bucket PSI terms quantized to
    // the 1e-6 grid BEFORE the total (order-free integer sum — the
    // lmScored contract), plus the headline total on every row. The
    // standard ML-ops distribution monitor: PSI < 0.1 stable,
    // > 0.25 drifted. One corpus pass + an 8-row aggregate at any
    // volume; the oracle replays buckets, smoothing, every quantized
    // term, and the windowed total.
    "q_psi_drift" -> QueryDef(
      (s, dir) => {
        import graft.operators.TextAnalysis.tokens
        val b = graft.InternalCaches.track(
          graft.functions.Functions.spreadScan(table(s, dir, "documents"))
            .select((col("doc_id") % 2 === 0).as("ref"),
              size(tokens(col("text"))).as("n"))
            .persist())
        val mx = broadcast(b.agg(max("n").as("mx"),
          sum(when(col("ref"), 1L).otherwise(0L)).as("ta"),
          sum(when(!col("ref"), 1L).otherwise(0L)).as("tb")))
        val h = b.crossJoin(mx)
          .select(expr("(n * 8) div (mx + 1)").cast("long").as("bucket"),
            col("ref"))
          .groupBy("bucket")
          .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("ref"), 1L).otherwise(0L)).as("cb"))
        val pa = (col("ca") + 1) * lit(1.0) / (col("ta") + 8)
        val pb = (col("cb") + 1) * lit(1.0) / (col("tb") + 8)
        val t6 = round(lit(1000000.0) * (pa - pb) * log(pa / pb)).cast("long")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy().orderBy().rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        h.crossJoin(mx)
          .select(col("bucket"), col("ca"), col("cb"), t6.as("__t6"))
          .select(col("bucket"), col("ca"), col("cb"),
            round(col("__t6") / lit(1000000.0), 6).as("psi_term"),
            round(sum("__t6").over(w) / lit(1000000.0), 4).as("psi_total"))
          .orderBy("bucket")
      },
      """WITH d AS (
        |  SELECT doc_id % 2 = 0 AS ref,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n
        |  FROM documents),
        |mx AS (SELECT max(n) AS mx,
        |  CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS ta,
        |  CAST(sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS tb
        |  FROM d),
        |h AS (
        |  SELECT (n * 8) // (mx + 1) AS bucket,
        |    CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM d, mx GROUP BY 1),
        |t AS (
        |  SELECT bucket, ca, cb,
        |    CAST(round(1000000 *
        |      (((ca + 1) * 1.0 / (ta + 8)) - ((cb + 1) * 1.0 / (tb + 8))) *
        |      ln(((ca + 1) * 1.0 / (ta + 8)) / ((cb + 1) * 1.0 / (tb + 8))))
        |      AS BIGINT) AS t6
        |  FROM h, mx)
        |SELECT CAST(bucket AS BIGINT) AS bucket, ca, cb,
        |  round(t6 / 1000000.0, 6) AS psi_term,
        |  round(CAST(sum(t6) OVER () AS BIGINT) / 1000000.0, 4) AS psi_total
        |FROM t ORDER BY bucket""".stripMargin)
  )
}
