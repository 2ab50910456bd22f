package graft

import graft.operators.Dedup
import graft.pipelines.Corpus
import org.apache.spark.sql.functions._

/** Pair-graph clustering and the end-to-end corpus preparation run. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("clusterPairs: chain and isolated pair form the right components") {
    // components: {1,2,3} (chain via 2), {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("clusterPairs converges on a long chain within the iteration cap") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(chain, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L))
    assert(got.size == 20)
  }

  test("driver union-find survives a 100k-edge chain (iterative find) " +
      "and non-long ids") {
    // chain depth is the adversarial case for recursive path
    // compression — this must not stack-overflow
    val chain = (1L until 100000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(chain).select("cluster_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(labels == Seq(1L))
    // string ids go through the same driver path, preserving the type
    val strPairs = Seq(("docB", "docA"), ("docC", "docB")).toDF("id_a", "id_b")
    val got = Dedup.clusterPairs(strPairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA"))
  }

  test("driver union-find and the distributed loop agree (threshold forced both ways)") {
    val pairs = (Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 11L), (20L, 21L)) ++
      (30L until 45L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val viaDriver = Dedup.clusterPairs(pairs, driverMaxPairs = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = Dedup.clusterPairs(pairs, driverMaxPairs = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(3L) == 1L && viaDriver(11L) == 7L && viaDriver(44L) == 30L)
  }

  test("prepare: quality gate, exact dups, and near-dup clusters all collapse") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),  // exact dup of 1
      (3L, "THE  quick brown fox jumps over the lazy dog tonight"), // normalized dup of 1
      (4L, "the quick brown fox jumps over the lazy cat tonight"),  // near-dup of 1
      (5L, "!!! ??? ***"),                                          // punctuation junk
      (6L, "too short"),                                            // under token floor
      (7L, "completely different text with many unrelated words inside it")
    ).toDF("doc_id", "text")
    val out = Corpus.prepare(docs,
      Corpus.Config(minTokens = 5, maxPunctRatio = 0.3, nearDupJaccard = 0.5))
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 7L))
    val tok = out.filter(col("doc_id") === 1L).select("n_tokens").head().getInt(0)
    assert(tok == 10)
  }

  test("both pair strategies keep the same survivors on the fixture") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "the quick brown fox jumps over the lazy cat tonight"),
      (7L, "completely different text with many unrelated words inside it")
    ).toDF("doc_id", "text")
    val lsh = Corpus.prepare(docs, Corpus.Config(nearDupJaccard = 0.5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val exact = Corpus.prepare(docs,
      Corpus.Config(nearDupJaccard = 0.5,
        pairStrategy = Corpus.ExactPostingLists))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(lsh == exact && lsh == Seq(1L, 7L))
  }
}
