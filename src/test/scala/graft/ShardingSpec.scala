package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._

/** Deterministic shuffle-sharding and equi-depth binning. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("shuffleShard is a permutation: every row exactly once, pos " +
      "dense 1..n per shard, all shards populated") {
    val ids = (1L to 5000L).toDF("id")
    val sharded = Sharding.shuffleShard(ids, "id", 16).cache()
    assert(sharded.count() == 5000)
    assert(sharded.select("id").distinct().count() == 5000)
    val perShard = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(perShard.length == 16)
    perShard.foreach { r =>
      assert(r.getAs[Int]("lo") == 1)
      assert(r.getAs[Int]("hi").toLong == r.getAs[Long]("n"))
    }
    // mod on a 32-bit hash balances: no shard 2x off the mean
    val ns = perShard.map(_.getAs[Long]("n"))
    assert(ns.min > 5000 / 16 / 2 && ns.max < 5000 / 16 * 2)
    sharded.unpersist()
  }

  test("shuffleShard is salt-seeded: same salt replays, new salt " +
      "permutes") {
    val ids = (1L to 500L).toDF("id")
    val a = Sharding.shuffleShard(ids, "id", 4)
    val b = Sharding.shuffleShard(ids, "id", 4)
    assert(a.exceptAll(b).count() == 0)
    val c = Sharding.shuffleShard(ids, "id", 4, salt = "epoch2")
    assert(c.exceptAll(a).count() > 0)
  }

  test("equiDepthBins: equal counts within 1 per group, boundaries " +
      "ordered and non-overlapping") {
    val rows = (for (i <- 1 to 1000; g <- Seq("x", "y"))
      yield (g, i, i * 7 % 1000)).toDF("g", "id", "v")
    val binned = Sharding.equiDepthBins(rows, "g", "v", 8, Seq("id"))
    val stats = binned.groupBy("g", "bin")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("g", "bin").collect()
    assert(stats.length == 16)
    val counts = stats.map(_.getAs[Long]("n"))
    assert(counts.max - counts.min <= 1)
    stats.grouped(8).foreach { grp =>
      grp.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Int]("hi") <= b.getAs[Int]("lo"))
        case _ =>
      }
    }
  }
}
