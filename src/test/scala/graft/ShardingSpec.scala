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
  test("q_shard_manifest: counts partition; a one-row change moves ONE shard's checksum") {
    import spark.implicits._
    def corpus(mutate: Boolean) = (0L until 40L).map { i =>
      (i, if (mutate && i == 17L) "mutated text row" else s"doc $i body tokens")
    }.toDF("doc_id", "text")
    def manifest(mutate: Boolean): Map[Int, (Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_manifix").toString
      corpus(mutate).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.registry("q_shard_manifest").fn(spark, dir)
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val a = manifest(mutate = false)
    val b = manifest(mutate = true)
    assert(a.values.map(_._1).sum == 40L)
    // counts identical everywhere (membership unchanged) ...
    assert(a.view.mapValues(_._1).toMap == b.view.mapValues(_._1).toMap)
    // ... and exactly one shard's checksum moved: doc 17's shard
    val moved = a.keySet.filter(k => a(k)._2 != b(k)._2)
    assert(moved.size == 1, s"expected one moved shard, got $moved")
  }
}
