package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom pre-filtered joins: exactness vs the plain joins, the
  * zero-false-negative hashing contract, null-key semantics, and both
  * codegen and interpreted evaluation paths.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def largeLong = (1L to 1000L).map(i => (i, s"v$i"))
    .toDF("k", "payload")
  private def keysLong = (1L to 1000L by 7).map(Tuple1(_)).toDF("key")

  test("no false negatives: every true member passes the probe (long and string)") {
    val bcL = BloomJoin.buildBloom(keysLong, "key")
    val missedL = keysLong.filter(!BloomJoin.mightContain(bcL, col("key"))).count()
    assert(missedL == 0L, "long keys: bloom false negative")

    val keysStr = (1 to 500).map(i => Tuple1(s"doc-$i-фы")).toDF("key")
    val bcS = BloomJoin.buildBloom(keysStr, "key")
    val missedS = keysStr.filter(!BloomJoin.mightContain(bcS, col("key"))).count()
    assert(missedS == 0L, "string keys: bloom false negative")

    // binary keys take the treeAggregate build (stat.bloomFilter
    // rejects BinaryType) — same putBinary hashing the probe uses
    val keysBin = (1 to 300).map(i => Tuple1(s"blob-$i".getBytes("UTF-8")))
      .toDF("key")
    val bcB = BloomJoin.buildBloom(keysBin, "key")
    val missedB = keysBin.filter(!BloomJoin.mightContain(bcB, col("key"))).count()
    assert(missedB == 0L, "binary keys: bloom false negative")
    val semiB = BloomJoin.bloomSemiJoin(
      (1 to 600).map(i => Tuple1(s"blob-$i".getBytes("UTF-8"))).toDF("key"),
      "key", keysBin, "key").count()
    assert(semiB == 300L)
  }

  test("bloomSemiJoin == exact left_semi; bloomAntiJoin == exact left_anti") {
    val semi = BloomJoin.bloomSemiJoin(largeLong, "k", keysLong, "key")
      .select("k").as[Long].collect().sorted
    val exactSemi = largeLong
      .join(keysLong.withColumnRenamed("key", "k"), Seq("k"), "left_semi")
      .select("k").as[Long].collect().sorted
    assert(semi.sameElements(exactSemi))

    val anti = BloomJoin.bloomAntiJoin(largeLong, "k", keysLong, "key")
      .select("k").as[Long].collect().sorted
    val exactAnti = largeLong
      .join(keysLong.withColumnRenamed("key", "k"), Seq("k"), "left_anti")
      .select("k").as[Long].collect().sorted
    assert(anti.sameElements(exactAnti))
    assert(semi.length + anti.length == 1000)
  }

  test("null keys: dropped by semi, kept by anti (SQL join semantics)") {
    // keysLong = {1, 8, 15, ...}: 8 is a member, 7 is not
    val withNulls = Seq(Some(7L), Some(8L), None).toDF("k")
    val semi = BloomJoin.bloomSemiJoin(withNulls, "k", keysLong, "key")
      .collect().map(r => Option(r.get(0)))
    assert(semi.toSet == Set(Some(8L)))
    val anti = BloomJoin.bloomAntiJoin(withNulls, "k", keysLong, "key")
      .collect().map(r => Option(r.get(0)))
    assert(anti.toSet == Set(Some(7L), None))
  }

  test("interpreted eval matches codegen") {
    val bc = BloomJoin.buildBloom(keysLong, "key")
    val probe = BloomJoin.mightContain(bc, col("k"))
    val codegen = largeLong.filter(probe).count()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = largeLong.filter(probe).count()
      assert(interpreted == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("declared bloom queries run non-empty at sf0.001") {
    val defs = BloomJoin.defs
    assert(defs("q_bloom_semi").fn(spark, sfDir).count() > 0)
    assert(defs("q_bloom_decontam").fn(spark, sfDir).count() > 0)
  }
}
