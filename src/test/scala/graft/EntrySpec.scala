package graft

/** Driver-contract surface: every registered query runs non-empty at
  * sf0.001 (except the legitimately-empty anti-join) and every oracle
  * key has a matching query.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    InternalCaches.scoped {
      assert(SparkEntry.entry(spark).count() > 0)
    }
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query runs at sf0.001; only the anti-join may be empty") {
    val mayBeEmpty = Set("q_join_anti", "q_ngram_jaccard", "q_dedup_minhash",
      "q_dedup_bow")
    // scope each run: operator-internal caches (shingle persists,
    // checkpoint handles) drain per query instead of piling up for
    // the rest of the shared-session suite run (DRAIN CONTRACT)
    SparkEntry.queries.foreach { case (name, fn) =>
      InternalCaches.scoped {
        val n = fn(spark, sfDir).count()
        assert(n >= 0, name)
        if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      }
    }
  }
}
