package graft.operators

import graft.{InternalCaches, QueryDef}
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph centrality (PageRank) over a relationship graph
  * derived from the harness tables — the "which suppliers/customers
  * anchor the trade graph" analysis, and the engine's representative
  * ITERATIVE operator: N rounds of join → aggregate with bounded
  * lineage, the Pregel-on-DataFrames shape.
  *
  * FIXED-POINT INTEGER ARITHMETIC, not doubles: each node's mass is a
  * BIGINT in units of 1/Mass (1e-12). Per-edge contributions are
  * integer floor-divisions (`pr div outdeg`) and the damping step is
  * `(85 * sum) div 100`, so every per-node sum is a sum of integers —
  * exact and ORDER-FREE regardless of partitioning, task order, or
  * engine. A double formulation would accumulate in whatever order the
  * shuffle delivered rows and could never hash-match an external
  * replay; this one is bit-identical in Spark and DuckDB (the same
  * quantize-before-summing contract as TextAnalysis.lmScored).
  *
  * Scale shape: `edges` (with out-degree attached) is the 100 TB side;
  * it persists ONCE and every iteration re-joins the (nodes-sized)
  * rank frame against it — rank is the only thing that shuffles per
  * round. `checkpointEvery` truncates lineage so a 50-iteration run
  * does not replan a 50-deep join tree (same bounded-lineage pattern
  * as Dedup.clusterPairs' label-propagation rounds).
  */
object Graph {

  /** Total mass in integer units: ranks are BIGINT fractions of this. */
  val Mass = 1000000000000L

  /** `iters` rounds of damped (d=0.85) PageRank over directed `edges`
    * (`src`, `dst` string columns). Every node must appear as a source
    * (callers build bidirectional edge sets, so out-degree ≥ 1 and no
    * dangling-mass redistribution is needed). Returns (node, pr) with
    * pr summing to ≈ Mass (floor losses only), ordered by rank.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
      checkpointEvery: Int = 0): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // reused every iteration: persist the degree-annotated edge list
    val e = InternalCaches.track(edges.join(deg, "src").persist())
    val nodes = InternalCaches.track(
      edges.select(col("src").as("node")).distinct().persist())
    // 1-row broadcast scalar (N, base): the only non-equi join in the
    // loop, same shape as q_lm_score's vocab-size factor
    val sc = broadcast(nodes.agg(count(lit(1)).as("n"))
      .selectExpr("n", s"(15 * $Mass) div (100 * n) as base"))
    var pr = nodes.crossJoin(sc).selectExpr("node", s"$Mass div n as pr")
    for (i <- 1 to iters) {
      val sums = e.join(pr, e("src") === pr("node"))
        .selectExpr("dst", "pr div outdeg as c")
        .groupBy("dst").agg(sum("c").as("contrib"))
      pr = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .crossJoin(sc)
        .selectExpr("node", "base + (85 * coalesce(contrib, 0)) div 100 as pr")
      // truncate lineage mid-run; the final iteration stays lazy so
      // the caller's action drives it
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        val (df, h) = InternalCaches.localCheckpointHandle(pr)
        InternalCaches.trackRdds(h)
        pr = df
      }
    }
    pr.orderBy(col("pr").desc, col("node"))
  }

  /** The customer↔supplier trade graph: an undirected edge for every
    * distinct (customer, supplier) pair that shares an order line.
    */
  def tradeEdges(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val pairs = InternalCaches.track(
      table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("s"), col("l_suppkey")).as("b"))
        .distinct().persist())
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** The 10-iteration replay, unrolled: standard recursive CTEs cannot
    * aggregate over the recursive reference, so each round is its own
    * CTE — identical integer arithmetic (`//` is DuckDB's integer
    * floor-div, matching Spark's `div` on the all-positive ranks).
    */
  private def pageRankOracleSql: String = {
    val rounds = (1 to 10).map { i =>
      s"""pr$i AS (
         |  SELECT n.node, CAST(sc.base + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n CROSS JOIN sc
         |  LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(p.pr // e.outdeg) AS BIGINT) AS c
         |    FROM edges e JOIN pr${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) s USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |edges0 AS (SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges0 GROUP BY src),
       |edges AS (SELECT e.src, e.dst, d.outdeg FROM edges0 e JOIN deg d USING (src)),
       |nodes AS (SELECT DISTINCT src AS node FROM edges0),
       |sc AS (SELECT count(*) AS n,
       |  CAST((15 * $Mass) // (100 * count(*)) AS BIGINT) AS base FROM nodes),
       |pr0 AS (SELECT node, CAST($Mass // n AS BIGINT) AS pr FROM nodes CROSS JOIN sc),
       |$rounds
       |SELECT node, pr FROM pr10 ORDER BY pr DESC, node""".stripMargin
  }

  def defs: Map[String, QueryDef] = Map(
    // 10 damped rounds over the bidirectional customer↔supplier trade
    // graph (~97 k edges at sf0.01). The oracle replays every round's
    // integer arithmetic, so a single off-by-one in any contribution,
    // any iteration, hash-mismatches — the iteration itself is checked,
    // not just the final ranking's plausibility.
    "q_pagerank" -> QueryDef(
      (s, dir) => pageRank(tradeEdges(s, dir), iters = 10, checkpointEvery = 5),
      pageRankOracleSql))
}
