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
}
