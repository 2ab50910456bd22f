package graft

import graft.operators.{Dedup, Hygiene}
import graft.pipelines.Corpus
import org.apache.spark.sql.functions._

/** The unpersist seam: operators that return lazy frames over internal
  * persists/checkpoints register them with InternalCaches, and a
  * post-action drain leaves the session with zero cached RDDs.
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def docs = {
    // planted near-dup pairs so the LSH/cluster paths do real work
    val base = (0 until 40).map(i =>
      (i.toLong, (0 until 12).map(t => s"d${i}q$t").mkString(" ")))
    val dups = (0 until 10).map(i =>
      (100L + i, base(i)._2 + " tail"))
    (base ++ dups).toDF("doc_id", "text")
  }

  private def clearAll(): Unit = {
    InternalCaches.drain(blocking = true)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  test("minhashNearDups + decontaminate + prepare: drain empties the session") {
    clearAll()
    Dedup.minhashNearDups(docs, "doc_id", "text", minJaccard = 0.8).count()
    Hygiene.decontaminate(docs, "doc_id", "text",
      pmod(col("doc_id"), lit(7)) === 0).count()
    Corpus.prepare(docs).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "precondition: the operators must actually have cached something")
    val n = InternalCaches.drain(blocking = true)
    assert(n >= 3, s"expected the three shingle/base persists tracked, got $n")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "caches survived the drain")
  }

  test("distributed clusterPairs keeps one live checkpoint per round and " +
      "drains to zero") {
    clearAll()
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 8L), (4L, 5L))
      .toDF("id_a", "id_b")
    // driverMaxPairs = 0 forces the iterative distributed path
    val out = Dedup.clusterPairs(pairs, driverMaxPairs = 0L)
    assert(out.count() == 8)
    // only the FINAL label checkpoint may be live (released-per-round
    // loop); the input-pair persist was unpersisted inside the operator
    val live = spark.sparkContext.getPersistentRDDs
    assert(live.nonEmpty, "final checkpoint should still back the lazy frame")
    // the returned frame stays usable before the drain...
    assert(out.filter(col("id") === col("cluster_id")).count() == 3)
    // ...and the drain clears the session completely
    InternalCaches.drain(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
