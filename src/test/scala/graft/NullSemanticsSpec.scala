package graft

import graft.functions.Functions._
import org.apache.spark.sql.functions._

/** SURVEY.md §7.5 #2: pandas null-semantics parity — each coercion
  * idiom pinned (errors='coerce', na=False, union-type inputs, NULL
  * join keys never matching).
  */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("try_cast: errors='coerce' family — garbage to NULL, valid preserved") {
    val got = Seq("42", " 42", "4.5", "abc", "", null)
      .toDF("s").select(tryLong(col("s")).as("v")).collect()
    assert(got(0).getLong(0) == 42L)
    assert(got(3).isNullAt(0) && got(4).isNullAt(0) && got(5).isNullAt(0))
  }

  test("NULL keys never join (pandas Int64 join parity)") {
    val left = Seq(Some(1L), None, Some(3L)).toDF("k")
    val right = Seq(Some(1L), None).toDF("k")
    assert(left.join(right, Seq("k")).count() == 1)
  }

  test("normalizeDictOrList: object, bare list, and garbage all canonicalize") {
    val got = Seq(
      """{"id": "abc"}""",
      """["x", "y"]""",
      """not json""",
      null
    ).toDF("j").select(normalizeDictOrList(col("j")).as("v"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("abc"))
    assert(got(1) == Seq("x", "y"))
    assert(got(2).isEmpty)
    assert(got(3).isEmpty)
  }

  test("epochMsAnyToTimestamp: int, numeric string, dict variants, garbage") {
    val ms = 1700000000000L
    val got = Seq(
      ms.toString,
      s"""{"timestamp": $ms}""",
      s"""{"ms": $ms}""",
      "garbage"
    ).toDF("x").select(epochMsAnyToTimestamp(col("x")).as("t")).collect()
    assert(got(0).getTimestamp(0).toInstant.toEpochMilli == ms)
    assert(got(1).getTimestamp(0).toInstant.toEpochMilli == ms)
    assert(got(2).getTimestamp(0).toInstant.toEpochMilli == ms)
    assert(got(3).isNullAt(0))
  }

  test("dedup operators tolerate null and empty text: no crash, null docs excluded") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, Some("the quick brown fox jumps tonight")),
      (2L, Some("the quick brown fox jumps tonight")),
      (3L, Some("")),        // empty text
      (4L, None)             // null text
    ).toDF("doc_id", "text")
    // minhash: the identical pair survives; null/empty docs never pair
    val mh = Dedup.minhashNearDups(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == Set((1L, 2L)))
    // simhash: same contract
    val sh = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.contains((1L, 2L)))
    assert(!sh.exists(p => p._1 == 4L || p._2 == 4L))
    // counting-join jaccard: exact pair only
    val jp = Dedup.jaccardPairs(
      Dedup.shingled(docs, "doc_id", "text"), "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jp == Set((1L, 2L)))
  }
}
