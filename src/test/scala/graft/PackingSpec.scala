package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Packing invariants that no single oracle hash pins: shard-local
  * offset contiguity, exact stream coverage, and span/capacity
  * consistency.
  */
class PackingSpec extends SparkSpec {

  private val cap = 256

  private lazy val docs = graft.sources.Tables.table(spark, sfDir, "documents")
  private lazy val packed =
    Packing.packSequences(docs, "doc_id", "text", seqTokens = cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("offsets are contiguous per shard: next start = start + n + eod") {
    for ((_, g) <- packed.groupBy(_._2)) {
      val byId = g.sortBy(_._1)
      assert(byId.head._4 == 0L)
      for (Array(a, b) <- byId.sliding(2))
        assert(b._4 == a._4 + a._3 + 1,
          s"gap between docs ${a._1} and ${b._1}")
    }
  }

  test("every doc is covered once and spans match its offsets") {
    assert(packed.length == docs.count())
    for ((id, _, n, start, first, last) <- packed) {
      assert(n >= 1, s"doc $id token count")
      assert(first == start / cap && last == (start + n - 1) / cap,
        s"doc $id span")
      assert(last >= first && last - first <= n / cap + 1)
    }
  }

  test("fill accounting ties out against the per-doc assignment") {
    val fill = Packing.packFill(docs, "doc_id", "text", seqTokens = cap)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((shard, g) <- packed.groupBy(_._2)) {
      val (nDocs, total, nSeqs) = fill(shard)
      val lastDoc = g.maxBy(_._1)
      assert(nDocs == g.length)
      assert(total == lastDoc._4 + lastDoc._3 + 1)
      assert(nSeqs == (total + cap - 1) / cap)
      // every doc's sequence span sits inside the shard's sequence count
      assert(g.forall(_._6 < nSeqs))
    }
  }

  test("sequences never cross shards and capacity bounds the payload") {
    // token t of sequence q within a shard is offset q*cap+t — by
    // construction; here we assert the derived spans stay in-capacity:
    // a doc starting at offset o in sequence o/cap occupies
    // min(n, cap - o%cap) tokens of it
    for ((_, _, n, start, first, _) <- packed) {
      val inFirst = math.min(n, cap - start % cap)
      assert(inFirst >= 1 && inFirst <= cap)
      assert((start % cap) + inFirst <= cap)
      assert(first == start / cap)
    }
  }
}
