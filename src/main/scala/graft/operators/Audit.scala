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
        |ORDER BY fk""".stripMargin)
  )
}
