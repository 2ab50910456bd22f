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

  // ---- triangles / k-core ---------------------------------------------

  private def undirected(pairs: (Int, Int)*) = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
  }

  test("triangleCounts: K4 — every node in 3 triangles, cc = 1") {
    val k4 = undirected((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val got = Graph.triangleCounts(k4).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getDouble(3) == 1.0)
    }
    InternalCaches.drain(blocking = true)
  }

  test("triangleCounts: a path closes into exactly one triangle") {
    assert(Graph.triangleCounts(
      undirected((1, 2), (2, 3), (3, 4))).count() == 0)
    val got = Graph.triangleCounts(
      undirected((1, 2), (2, 3), (3, 4), (1, 3)))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // node 4 has no triangle and drops out; cc(3) = 2·1/(3·2)
    assert(got == Map(
      1 -> ((2L, 1L, 1.0)), 2 -> ((2L, 1L, 1.0)),
      3 -> ((3L, 1L, math.rint(2.0 / 6.0 * 1e6) / 1e6))))
    InternalCaches.drain(blocking = true)
  }

  test("triangleCounts matches a brute-force driver replay on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (for (a <- 0 until 25; b <- a + 1 until 25
      if rnd.nextDouble() < 0.3) yield (a, b)).toSeq
    val got = Graph.triangleCounts(undirected(edges: _*))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val eset = edges.toSet
    def conn(x: Int, y: Int) =
      eset.contains((math.min(x, y), math.max(x, y)))
    val tri = for (x <- 0 until 25; y <- x + 1 until 25; z <- y + 1 until 25
      if conn(x, y) && conn(x, z) && conn(y, z)) yield (x, y, z)
    val perNode = tri.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == perNode)
    InternalCaches.drain(blocking = true)
  }

  test("kCore peels a tail off a triangle; converged rounds are no-ops") {
    // triangle + pendant path: the 2-core is exactly the triangle
    val g = Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 5))
    val core = Graph.kCore(undirected(g: _*), k = 2, rounds = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(core == Map(1 -> 2L, 2 -> 2L, 3 -> 2L))
    // more rounds past the fixpoint change nothing
    val more = Graph.kCore(undirected(g: _*), k = 2, rounds = 8,
      checkpointEvery = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(more == core)
    // a k above the max degree empties the graph
    assert(Graph.kCore(undirected(g: _*), k = 4, rounds = 3).count() == 0)
    InternalCaches.drain(blocking = true)
  }

  test("q_kcore survivors all hold core degree ≥ 18 on harness data") {
    val rows = SparkEntry.registry("q_kcore").fn(spark, sfDir).collect()
    assert(rows.forall(_.getLong(1) >= 18L),
      "a surviving node below k means the peel stopped before the fixpoint")
    InternalCaches.drain(blocking = true)
  }
}
