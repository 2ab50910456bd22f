package graft

import graft.operators.AtomicIncrement
import org.apache.spark.sql.functions._

/** The copy-on-write predicate UPDATE
  * ([[AtomicIncrement.updateWhereAtomic]]): SET expressions evaluate
  * against the OLD row (swap pinned), NULL-cond rows carry
  * untouched, dv-masked rows cannot resurrect, assigned values cast
  * to the column's standing type.
  */
class UpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  test("SET sees the old row: a = b, b = a swaps; NULL cond carries") {
    val sink = tmp("graft_upd_swap")
    try {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType, nullable = true)))
      AtomicIncrement.appendIncrementAtomic(
        spark.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(1L, 10L, 20L),
          org.apache.spark.sql.Row(2L, 30L, 40L),
          org.apache.spark.sql.Row(3L, null, 60L)), schema),
        sink, "k")
      // cond `a < 25` is NULL for k=3 (a null): must carry unchanged
      AtomicIncrement.updateWhereAtomic(spark, sink, $"a" < 25,
        Map("a" -> $"b", "b" -> $"a"))
      val got = AtomicIncrement.readCommitted(spark, sink)
        .orderBy("k").collect().map(r =>
          (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      assert(got.toSeq === Seq(
        (1L, Some(20L), Some(10L)), // swapped (old values, not chained)
        (2L, Some(30L), Some(40L)), // cond false: untouched
        (3L, None, Some(60L))))     // cond NULL: untouched
    } finally rm(sink)
  }

  test("a dv-masked row never resurrects through an UPDATE; assigned " +
      "values cast to the standing column type") {
    val sink = tmp("graft_upd_dv")
    try {
      AtomicIncrement.appendIncrementAtomic(
        (1 to 20).map(i => (i.toLong, i * 1.0)).toDF("k", "amt"),
        sink, "k")
      AtomicIncrement.mergeOnReadAtomic(
        Seq((5L, 0.0, true)).toDF("k", "amt", "del"), sink, "k", "del")
      AtomicIncrement.updateWhereAtomic(spark, sink, $"k" <= 10,
        Map("amt" -> lit(7))) // Int literal casts to the double column
      val now = AtomicIncrement.readCommitted(spark, sink)
      assert(now.count() === 19L)
      assert(now.filter($"k" === 5L).count() === 0L,
        "a tombstoned row resurrected through the UPDATE rewrite")
      assert(now.schema("amt").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(now.filter($"k" <= 10 && $"amt" =!= 7.0).count() === 0L)
    } finally rm(sink)
  }

  test("a case-mismatched SET key writes under the STANDING column " +
      "case — carried and rewritten files stay mergeSchema-compatible") {
    val sink = tmp("graft_upd_case")
    try {
      // two disjoint increments so the update leaves one file CARRIED
      // verbatim next to the rewritten one — the mixed read is where
      // a case-variant twin column ('AMT' next to 'amt') would
      // surface duplicate columns / nulls through mergeSchema
      AtomicIncrement.appendIncrementAtomic(
        (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "amt"),
        sink, "k")
      AtomicIncrement.appendIncrementAtomic(
        (11 to 20).map(i => (i.toLong, i * 1.0)).toDF("k", "amt"),
        sink, "k")
      AtomicIncrement.updateWhereAtomic(spark, sink, $"k" <= 5,
        Map("AMT" -> lit(0.0)),
        mayMatch = e => e.statsFor("k")
          .forall(s => s.min.toLong <= 5L)) // second file carries
      val now = AtomicIncrement.readCommitted(spark, sink)
      assert(now.schema.fieldNames.toSeq === Seq("k", "amt"),
        "SET must target the resolved standing name, not mint a " +
          s"case-variant twin: ${now.schema.fieldNames.mkString(",")}")
      assert(now.count() === 20L)
      assert(now.filter($"k" <= 5).select("amt").as[Double]
        .collect().forall(_ == 0.0))
      assert(now.filter($"k" > 5 && $"amt" === 0.0).count() === 0L)
    } finally rm(sink)
  }
}
