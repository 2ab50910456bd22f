package graft.operators

import graft.QueryDef
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §7.1: "salting for
  * skew"). AQE's skew-join split handles sort-merge skew at runtime;
  * salting is the declarative fallback when one key dominates so hard
  * that even a split partition won't fit — e.g. a null-heavy natural
  * key or a single viral entity.
  *
  * Shape: the probe side gets a deterministic salt in [0, factor) from
  * a hash of the whole row; the build side replicates each row
  * `factor` times (explode over the salt range). The join key becomes
  * (key, salt), spreading one hot key over `factor` reducers. Result
  * equals the plain inner equi-join row-for-row.
  */
object Skew {

  def saltedEquiJoin(probe: DataFrame, build: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0)
    // deterministic row-hash salt — no rand(): re-computed partitions
    // (task retries) must salt identically
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(factor)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  def defs: Map[String, QueryDef] = Map(
    // The salted join under the oracle gate: lineitem⋈orders on the
    // (salted) order key, re-aggregated per priority. The oracle is
    // the PLAIN equi-join — salting must be invisible in the result;
    // the salt fan-out shape itself is locked in PlanShapeSpec.
    "q_join_salted" -> QueryDef(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val ord = table(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        saltedEquiJoin(li, ord, "l_orderkey", factor = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
}
