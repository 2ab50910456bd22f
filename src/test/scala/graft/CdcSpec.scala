package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** CDC latest-wins resolution semantics on a hand fixture. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, value, version, delete)
  private val feed = Seq(
    (1L, "a0", 0, false),            // untouched insert
    (2L, "b0", 0, false), (2L, "b1", 1, false), (2L, "b2", 2, false),
    (3L, "c0", 0, false), (3L, "c1", 1, true), // deleted
    (4L, "d0", 0, false), (4L, "d1", 1, true), (4L, "d2", 2, false), // re-inserted
    (5L, "e0", 0, false), (5L, "e1", 1, true), (5L, "e1b", 1, false) // tie: delete wins
  ).toDF("k", "v", "ver", "del")

  test("latest version wins; deletes drop; re-insert revives; tie prefers delete") {
    val got = Cdc.latestView(feed, Seq("k"), "ver", "del")
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a0", 2L -> "b2", 4L -> "d2"))
  }

  test("scd2History: intervals chain, deletes close without emitting, " +
      "current rows stay open") {
    val hist = Cdc.scd2History(
      feed.filter(col("k") =!= 5), // tie-version key excluded: history needs distinct versions
      Seq("k"), "ver", "del")
      .select("k", "v", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
    assert(hist == Set(
      (1L, "a0", 0, None),
      (2L, "b0", 0, Some(1)), (2L, "b1", 1, Some(2)), (2L, "b2", 2, None),
      (3L, "c0", 0, Some(1)), // closed by the delete, which emits no row
      (4L, "d0", 0, Some(1)), (4L, "d2", 2, None)))
  }

  test("resolution is idempotent: resolving the resolved view is a no-op") {
    val once = Cdc.latestView(feed, Seq("k"), "ver", "del")
    val twice = Cdc.latestView(once, Seq("k"), "ver", "del")
    assert(twice.exceptAll(once).count() == 0)
    assert(once.exceptAll(twice).count() == 0)
  }
}
