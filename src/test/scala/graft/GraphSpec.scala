package graft

import org.apache.spark.sql.functions._

/** Fixed-point PageRank: the integer iteration is replayed exactly on
  * the driver for a hand-built graph, structural rank order is checked
  * on known topologies, and mass conservation + checkpoint invariance
  * pin the distributed mechanics.
  */
class GraphSpec extends SparkSpec {
  import operators.Graph

  private def edgeDf(pairs: (String, String)*) = {
    import spark.implicits._
    // bidirectional, like every caller of pageRank
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  /** Exact driver replay of the integer iteration. */
  private def replay(pairs: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val nodes = edges.map(_._1).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val base = (15L * Graph.Mass) / (100L * n)
    var pr: Map[String, Long] = nodes.map(_ -> Graph.Mass / n).toMap
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outdeg(s) }.sum
      }
      pr = nodes.map(nd => nd -> (base + (85L * sums.getOrElse(nd, 0L)) / 100L)).toMap
    }
    pr
  }

  test("pageRank matches an exact integer driver replay on a hand graph") {
    val pairs = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "d", "d" -> "e")
    val got = Graph.pageRank(edgeDf(pairs: _*), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == replay(pairs, 10))
  }

  test("symmetric pair splits mass evenly; star hub outranks leaves") {
    val pair = Graph.pageRank(edgeDf("a" -> "b"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pair("a") == pair("b"))
    val star = Graph.pageRank(
      edgeDf("hub" -> "l1", "hub" -> "l2", "hub" -> "l3"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(star("hub") > star("l1"))
    assert(star("l1") == star("l2") && star("l2") == star("l3"))
  }

  test("mass is conserved up to floor losses") {
    val pr = Graph.pageRank(
      edgeDf("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d"), iters = 10)
      .agg(sum("pr")).collect()(0).getLong(0)
    // each of the ≤8 divisions per node per round floors away < 1 unit
    assert(math.abs(pr - Graph.Mass) < 1000L,
      s"mass drifted to $pr (expected ≈ ${Graph.Mass})")
  }

  test("checkpoint interval is invisible to the result") {
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a", "a" -> "c")
    val plain = Graph.pageRank(edgeDf(pairs: _*), iters = 6, checkpointEvery = 0)
      .collect().toSeq
    val chk = Graph.pageRank(edgeDf(pairs: _*), iters = 6, checkpointEvery = 2)
      .collect().toSeq
    assert(plain == chk)
    InternalCaches.drain(blocking = true)
  }

  test("q_pagerank: trade graph is bipartite and ranks every node once") {
    val rows = SparkEntry.registry("q_pagerank").fn(spark, sfDir).collect()
    val nodes = rows.map(_.getString(0))
    assert(nodes.distinct.length == nodes.length)
    assert(nodes.forall(n => n.startsWith("c") || n.startsWith("s")))
    // bidirectional edges guarantee both sides present
    assert(nodes.exists(_.startsWith("c")) && nodes.exists(_.startsWith("s")))
    // output arrives rank-ordered
    val prs = rows.map(_.getLong(1))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    InternalCaches.drain(blocking = true)
  }
}
