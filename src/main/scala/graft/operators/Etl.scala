package graft.operators

import graft.QueryDef
import graft.functions.Functions._
import graft.functions.Workdays
import graft.sources.Tables.table
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's transform semantics (SURVEY.md §2.6/§2.9) exercised
  * end-to-end over the harness tables: when-chain classification,
  * split/slice name munging, dtype-driven null fill, tolerant casts,
  * timestamp kit, and the business-day duration — all pure column
  * expressions inside whole-stage codegen (zero UDFs).
  */
object Etl {

  def defs: Map[String, QueryDef] = Map(

    // F5: first-match-wins when-chain (np.select); reference:
    // create_projectsync_dataset.ipynb cell 9 (object_name).
    "q_when_chain" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val cls = whenChain(
          Seq(
            (col("o_totalprice") > 400000, lit("огромный")),
            (col("o_totalprice") > 200000, lit("большой")),
            (col("o_orderpriority") === "1-URGENT", lit("срочный")),
            (col("o_orderstatus") === "F", lit("завершён"))),
          lit("обычный"))
        o.withColumn("order_class", cls)
          .groupBy("order_class")
          .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
          .orderBy("order_class")
      },
      """SELECT CASE
        |    WHEN o_totalprice > 400000 THEN 'огромный'
        |    WHEN o_totalprice > 200000 THEN 'большой'
        |    WHEN o_orderpriority = '1-URGENT' THEN 'срочный'
        |    WHEN o_orderstatus = 'F' THEN 'завершён'
        |    ELSE 'обычный' END AS order_class,
        |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY order_class""".stripMargin),

    // F3: extract_short_name (split + slice + rejoin); reference:
    // create_projectsync_dataset.ipynb cell 8.
    "q_short_name" -> QueryDef(
      (s, dir) => table(s, dir, "part")
        .select(
          col("p_partkey"),
          shortName(col("p_type"), " ").as("short_type"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
        |  array_to_string(str_split(p_type, ' ')[1:2], ' ') AS short_type
        |FROM part ORDER BY p_partkey""".stripMargin),

    // F4: conditional suffix strip (extract_file_storage_name);
    // reference: create_projectsync_dataset.ipynb cell 11. Project
    // names are synthesized as "<segment>_<custkey>" with the custkey
    // as the username so both branches of the conditional fire.
    "q_storage_name" -> QueryDef(
      (s, dir) => {
        val c = table(s, dir, "customer")
          .withColumn("project_name",
            concat_ws("_", col("c_mktsegment"), col("c_custkey"),
              when(col("c_custkey") % 2 === 0, col("c_name")).otherwise(lit("other"))))
          .withColumn("username", col("c_name"))
        c.select(
          col("c_custkey"),
          fileStorageName(col("project_name"), col("username")).as("storage_name"))
          .orderBy("c_custkey")
      },
      """WITH t AS (
        |  SELECT c_custkey,
        |    c_mktsegment || '_' || c_custkey || '_' ||
        |      (CASE WHEN c_custkey % 2 = 0 THEN c_name ELSE 'other' END) AS project_name,
        |    c_name AS username
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN lower(trim(str_split(project_name, '_')[-1])) = lower(trim(username))
        |    THEN array_to_string(str_split(project_name, '_')[1:len(str_split(project_name,'_'))-1], '_')
        |    ELSE project_name END AS storage_name
        |FROM t ORDER BY c_custkey""".stripMargin),

    // F12: dtype-driven null canonicalization (fillna by dtype);
    // reference: create_projectsync_dataset.ipynb cell 14. Nulls are
    // injected with nullif so the fill actually fires.
    "q_fill_by_type" -> QueryDef(
      (s, dir) => {
        val c = table(s, dir, "customer")
          .withColumn("c_mktsegment", nullif(col("c_mktsegment"), lit("BUILDING")))
          .withColumn("c_acctbal",
            when(col("c_acctbal") < 0, lit(null).cast(DoubleType))
              .otherwise(round(col("c_acctbal"), 2)))
        fillByType(c)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'Нет данных') AS c_mktsegment,
        |  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END, 0) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // F11: tolerant numeric coercion (to_numeric errors='coerce');
    // reference: create_scripts_dataset.ipynb cell 10. Digits are
    // regex-extracted from the JSON-ish props string then try_cast.
    "q_try_cast" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).try_cast(LongType))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("event_type"),
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // F1/F2/F16: string kit — trim, prefix strip, first token;
    // references: create_scripts_dataset.ipynb cell 3,
    // create_gitlab_dataset.ipynb cell 5, fetch_gsheet_instructions.py:48.
    "q_string_kit" -> QueryDef(
      (s, dir) => table(s, dir, "part")
        .select(
          col("p_partkey"),
          stripPrefix(col("p_type"), "STANDARD ").as("type_stripped"),
          firstToken(col("p_name")).as("first_word"),
          trim(upper(col("p_brand"))).as("brand_uc"))
        .orderBy("p_partkey"),
      """SELECT p_partkey,
        |  regexp_replace(p_type, '^STANDARD ', '') AS type_stripped,
        |  str_split(p_name, ' ')[1] AS first_word,
        |  trim(upper(p_brand)) AS brand_uc
        |FROM part ORDER BY p_partkey""".stripMargin),

    // F7/F8: timestamp kit — epoch-ms roundtrip, formatting, truncation;
    // reference: fetch_yougile_programming.py:160-191 (to_iso).
    "q_timestamp_kit" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"),
          date_trunc("hour", col("ts")).cast(DateType).cast(StringType).as("day"),
          hour(col("ts")).as("hr"),
          dayofweek(col("ts")).as("dow"))
        .orderBy("event_id"),
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
        |  strftime(ts, '%Y-%m-%d') AS day,
        |  hour(ts) AS hr,
        |  dayofweek(ts) + 1 AS dow
        |FROM events ORDER BY event_id""".stripMargin),

    // F9: UTC → Asia/Yekaterinburg conversion (to_local); reference:
    // create_yougile_dataset.ipynb cell 7.
    "q_tz_convert" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .select(
          col("event_id"),
          date_format(toLocal(col("ts")), "yyyy-MM-dd HH:mm").as("local_time"))
        .orderBy("event_id"),
      """SELECT event_id,
        |  strftime(timezone('Asia/Yekaterinburg', timezone('UTC', ts)), '%Y-%m-%d %H:%M') AS local_time
        |FROM events ORDER BY event_id""".stripMargin),

    // F10: business-day duration between order and ship dates —
    // closed-form weekday math (graft.functions.Workdays), holiday
    // set empty here so the oracle is a pure transliteration;
    // reference: create_yougile_dataset.ipynb cell 7 (workdays_diff).
    "q_workdays" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders").select("o_orderkey", "o_orderdate")
        val li = table(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_shipdate")
        val noHolidays = array().cast("array<date>")
        o.join(li, o("o_orderkey") === li("l_orderkey"))
          .select(
            col("o_orderkey"), col("l_linenumber"),
            Workdays.workdaysDiff(col("o_orderdate"), col("l_shipdate"), noHolidays)
              .as("work_days"))
          .orderBy("o_orderkey", "l_linenumber")
      },
      // Same closed form: weekdays in (d1,d2] via Monday-anchored index
      // f(n)=5*(n//7)+least(n%7,5); midnight timestamps make the first
      // day contribute 1.0 (if a weekday) and the last day 0.
      """WITH pairs AS (
        |  SELECT o_orderkey, l_linenumber,
        |    CAST(o_orderdate AS DATE) AS d1, CAST(l_shipdate AS DATE) AS d2
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |calc AS (
        |  SELECT o_orderkey, l_linenumber, d1, d2,
        |    datediff('day', DATE '1970-01-05', d1 + 1) AS n1,
        |    datediff('day', DATE '1970-01-05', d2 + 1) AS n2,
        |    isodow(d1) <= 5 AS w1
        |  FROM pairs)
        |SELECT o_orderkey, l_linenumber,
        |  round(CASE
        |    WHEN d1 < d2 THEN
        |      greatest((5*(n2//7) + least(n2%7, 5)) - (5*(n1//7) + least(n1%7, 5)) - 1, 0)
        |      + (CASE WHEN w1 THEN 1.0 ELSE 0.0 END)
        |    ELSE 0.0 END, 2) AS work_days
        |FROM calc ORDER BY o_orderkey, l_linenumber""".stripMargin),

    // F10 with the real holiday fixture: same closed-form weekday math
    // plus an O(|H|) per-row holiday scan (|H| ≈ 100 — array literal
    // beats a join at any scale). The oracle transliterates the same
    // formula with DuckDB list lambdas over the same date literals.
    "q_workdays_ru" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders").select("o_orderkey", "o_orderdate")
        val li = table(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_shipdate")
        val hol = Workdays.ruHolidayColumn(1995, 2001)
        o.join(li, o("o_orderkey") === li("l_orderkey"))
          .select(
            col("o_orderkey"), col("l_linenumber"),
            Workdays.workdaysDiff(col("o_orderdate"), col("l_shipdate"), hol)
              .as("work_days"))
          .orderBy("o_orderkey", "l_linenumber")
      }, {
        val holList = Workdays.ruHolidays(1995, 2001)
          .map(d => s"DATE '$d'").mkString("[", ", ", "]")
        s"""WITH pairs AS (
          |  SELECT o_orderkey, l_linenumber,
          |    CAST(o_orderdate AS DATE) AS d1, CAST(l_shipdate AS DATE) AS d2
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |calc AS (
          |  SELECT o_orderkey, l_linenumber, d1, d2,
          |    datediff('day', DATE '1970-01-05', d1 + 1) AS n1,
          |    datediff('day', DATE '1970-01-05', d2 + 1) AS n2,
          |    (isodow(d1) <= 5 AND NOT list_contains($holList, d1)) AS w1,
          |    len(list_filter($holList,
          |      h -> h > d1 AND h <= d2 AND isodow(h) <= 5)) AS nh
          |  FROM pairs)
          |SELECT o_orderkey, l_linenumber,
          |  round(CASE
          |    WHEN d1 < d2 THEN
          |      greatest((5*(n2//7) + least(n2%7, 5)) - (5*(n1//7) + least(n1%7, 5)) - nh - 1, 0)
          |      + (CASE WHEN w1 THEN 1.0 ELSE 0.0 END)
          |    ELSE 0.0 END, 2) AS work_days
          |FROM calc ORDER BY o_orderkey, l_linenumber""".stripMargin
      }),

    // S2-adjacent: semi-structured JSON column parse (from_json with a
    // declared schema, struct field access) — the ingest-normalization
    // path for the reference's nested REST payloads
    // (fetch_yougile_programming.py:283-297).
    "q_json_parse" -> QueryDef(
      (s, dir) => table(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Data profiling: per-column completeness/cardinality/range in ONE
    // pass (every ETL run's first diagnostic; generalizes the
    // reference's printed row counters). Unpivoted to (column, metric)
    // rows so the shape is schema-independent.
    "q_profile" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        o.agg(
          count(lit(1)).as("n_rows"),
          count(col("o_custkey")).as("custkey_nonnull"),
          countDistinct(col("o_custkey")).as("custkey_distinct"),
          count(col("o_orderstatus")).as("status_nonnull"),
          countDistinct(col("o_orderstatus")).as("status_distinct"),
          round(min("o_totalprice"), 2).as("price_min"),
          round(max("o_totalprice"), 2).as("price_max"),
          round(avg("o_totalprice"), 2).as("price_avg"))
      },
      """SELECT count(*) AS n_rows,
        |  count(o_custkey) AS custkey_nonnull,
        |  count(DISTINCT o_custkey) AS custkey_distinct,
        |  count(o_orderstatus) AS status_nonnull,
        |  count(DISTINCT o_orderstatus) AS status_distinct,
        |  round(min(o_totalprice), 2) AS price_min,
        |  round(max(o_totalprice), 2) AS price_max,
        |  round(avg(o_totalprice), 2) AS price_avg
        |FROM orders""".stripMargin),

    // P10: all-null column drop exercised through the declared-query
    // surface: inject an all-null and a partly-null column; the helper
    // must drop only the former (pandas dropna(axis=1, how='all');
    // reference: fetch_asterisk_cdr.py:61).
    "q_drop_null_cols" -> QueryDef(
      (s, dir) => {
        val df = table(s, dir, "region")
          .withColumn("all_null", lit(null).cast(StringType))
          .withColumn("some_null",
            when(col("r_regionkey") % 2 === 0, col("r_name")))
        dropAllNullColumns(df).orderBy("r_regionkey")
      },
      """SELECT r_regionkey, r_name,
        |  CASE WHEN r_regionkey % 2 = 0 THEN r_name END AS some_null
        |FROM region ORDER BY r_regionkey""".stripMargin)
  )
}
