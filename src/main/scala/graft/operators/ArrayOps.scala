package graft.operators

import graft.QueryDef
import graft.functions.Functions.spreadScan
import graft.sources.Tables.table
import org.apache.spark.sql.functions._

/** Array / explode / map-decode operators (SURVEY.md §2.3 P11-P12,
  * §2.4 J12, §2.6 F13-F14, §2.7 set ops): the reference's
  * list-valued-attribute semantics — explode + dim join + re-aggregate
  * to a joined string, membership over array intersection, and
  * static-map decode with fallback.
  */
object ArrayOps {

  def defs: Map[String, QueryDef] = Map(

    // J12/F14: the user-resolution shape — explode the fact's key,
    // dim join, re-aggregate to a sorted joined string with a default
    // for unmatched (reference: fetch_yougile_programming.py:195-200,
    // 261-267). No broadcast hint: supplier grows with scale factor,
    // so the planner/AQE must own the build-side decision (it still
    // auto-broadcasts below the threshold).
    "q_explode_agg" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val sup = table(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        li.join(sup, li("l_suppkey") === sup("s_suppkey"), "left")
          .groupBy("l_orderkey")
          .agg(
            array_join(array_sort(collect_set(
              coalesce(col("s_name"), lit("Не назначен")))), ", ").as("suppliers"),
            countDistinct("l_suppkey").as("n_suppliers"))
          .orderBy("l_orderkey")
      },
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(DISTINCT coalesce(s_name, 'Не назначен'))), ', ')
        |    AS suppliers,
        |  count(DISTINCT l_suppkey) AS n_suppliers
        |FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),

    // P12/§2.7: set algebra on array values — overlap test and
    // intersection size against a constant set (reference:
    // fetch_yougile_programming.py:505-509 arrays_overlap;
    // :208,228 key-set intersect/union).
    "q_array_ops" -> QueryDef(
      (s, dir) => {
        val stop = array(Seq("the", "and", "of", "data").map(lit): _*)
        spreadScan(table(s, dir, "documents"))
          .select(col("doc_id"),
            array_distinct(split(trim(lower(col("text"))), "\\s+")).as("toks"))
          .select(
            col("doc_id"),
            arrays_overlap(col("toks"), stop).as("has_stopword"),
            size(array_intersect(col("toks"), stop)).as("n_common"),
            size(array_union(col("toks"), stop)).as("n_union"))
          .orderBy("doc_id")
      },
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks,
        |    ['the','and','of','data'] AS stop
        |  FROM documents)
        |SELECT doc_id,
        |  len(list_intersect(toks, stop)) > 0 AS has_stopword,
        |  len(list_intersect(toks, stop)) AS n_common,
        |  len(list_distinct(toks || stop)) AS n_union
        |FROM t ORDER BY doc_id""".stripMargin),

    // F13: static-map decode with identity fallback (dict.get(k, k);
    // reference: fetch_yougile_programming.py:265, 33-41).
    "q_map_lookup" -> QueryDef(
      (s, dir) => {
        val decode = typedlit(Map(
          "click" -> "Клик", "view" -> "Просмотр", "purchase" -> "Покупка"))
        table(s, dir, "events")
          .select(coalesce(element_at(decode, col("event_type")), col("event_type"))
            .as("event_ru"))
          .groupBy("event_ru").agg(count(lit(1)).as("n"))
          .orderBy("event_ru")
      },
      """SELECT CASE event_type
        |    WHEN 'click' THEN 'Клик'
        |    WHEN 'view' THEN 'Просмотр'
        |    WHEN 'purchase' THEN 'Покупка'
        |    ELSE event_type END AS event_ru,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY event_ru""".stripMargin),

    // §2.7 set ops on tables: EXCEPT/INTERSECT between two period
    // slices of the same fact (customers active only early vs in both).
    "q_set_ops" -> QueryDef(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val early = o.filter(col("o_orderdate") < "1998-01-01").select("o_custkey")
        val late = o.filter(col("o_orderdate") >= "1998-01-01").select("o_custkey")
        early.intersect(late).withColumn("status", lit("both"))
          .union(early.except(late).withColumn("status", lit("early_only")))
          .groupBy("status").agg(countDistinct("o_custkey").as("n_customers"))
          .orderBy("status")
      },
      """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1998-01-01'),
        |late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
        |labeled AS (
        |  SELECT o_custkey, 'both' AS status FROM (SELECT DISTINCT o_custkey FROM early INTERSECT SELECT DISTINCT o_custkey FROM late)
        |  UNION ALL
        |  SELECT o_custkey, 'early_only' AS status FROM (SELECT DISTINCT o_custkey FROM early EXCEPT SELECT DISTINCT o_custkey FROM late))
        |SELECT status, count(DISTINCT o_custkey) AS n_customers
        |FROM labeled GROUP BY status ORDER BY status""".stripMargin)
  )
}
