package graft

import graft.operators.AtomicIncrement
import graft.sources.GraftAtomicRelation
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The `graft-atomic` Spark data source: SQL views over the manifest
  * sink, WHERE-driven file pruning as a pure performance move
  * (pruned∘filter ≡ full∘filter always), delete-vector application,
  * and time travel through read options.
  */
class AtomicTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_dsv1").resolve("sink").toString

  /** Three disjoint key-range increments + one file whose `s` column
    * is all null (the NullTag pruning case).
    */
  private def load(sink: String): Unit = {
    for (r <- Seq(1L to 10L, 11L to 20L, 21L to 30L))
      AtomicIncrement.appendIncrementAtomic(
        r.map(k => (k, s"name-$k", k * 1.5, Option(s"s$k")))
          .toDF("k", "nm", "price", "s").repartition(1),
        sink, "k", Seq("nm", "price", "s"))
    AtomicIncrement.appendIncrementAtomic(
      Seq((31L, "name-31", 46.5, Option.empty[String]))
        .toDF("k", "nm", "price", "s"),
      sink, "k", Seq("nm", "price", "s"))
  }

  private def sqlView(sink: String, name: String,
      opts: String = ""): Unit =
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW $name
      USING `graft-atomic` OPTIONS (path '$sink'$opts)""")

  private def scanned(sink: String): (Int, Int) =
    GraftAtomicRelation.lastScanFor(sink)

  test("SQL view reads the committed snapshot; WHERE clauses prune " +
      "files through the manifest stats and stay ≡ full scan + filter") {
    val sink = tmp()
    load(sink)
    sqlView(sink, "t")
    assert(spark.sql("SELECT count(*) c FROM t").head().getLong(0) == 31)
    // range predicate: two of four files provably cannot match
    val hi = spark.sql("SELECT k FROM t WHERE k > 20 AND k <= 30")
      .as[Long].collect().sorted.toSeq
    assert(hi == (21L to 30L))
    assert(scanned(sink)._1 < scanned(sink)._2,
      s"range WHERE did not prune: ${scanned(sink)}")
    // equality on the string column (stats-covered): byte-order
    // intervals keep files 1 ("s15" sorts inside [s1, s9]) and 2
    // (its own range) and prune file 3 + the all-null file
    assert(spark.sql("SELECT price FROM t WHERE s = 's15'")
      .head().getDouble(0) == 22.5)
    assert(scanned(sink)._1 == 2, s"point WHERE kept ${scanned(sink)._1} files")
    // IN list spanning two ranges
    assert(spark.sql("SELECT sum(k) x FROM t WHERE k IN (5, 25)")
      .head().getLong(0) == 30)
    assert(scanned(sink)._1 == 2, s"IN kept ${scanned(sink)._1}")
    // prefix predicate on the stats-covered string
    assert(spark.sql("SELECT count(*) c FROM t WHERE s LIKE 's2%'")
      .head().getLong(0) == 11) // s2 and s20..s29
    // IS NOT NULL prunes the provably-all-null file
    spark.sql("SELECT count(*) c FROM t WHERE s IS NOT NULL").head()
    assert(scanned(sink)._1 == 3, s"IsNotNull kept ${scanned(sink)._1} of 4")
    // a double-family range
    assert(spark.sql("SELECT count(*) c FROM t WHERE price > 30.0")
      .head().getLong(0) == 11)
    assert(scanned(sink)._1 < scanned(sink)._2)
    // aggregation without any filter reads everything
    assert(spark.sql("SELECT min(k) a, max(k) b FROM t").head()
      == org.apache.spark.sql.Row(1L, 31L))
  }

  test("delete vectors apply through the SQL face; the view follows " +
      "the table as it moves (latest re-resolves per scan)") {
    val sink = tmp()
    load(sink)
    sqlView(sink, "t2")
    assert(spark.sql("SELECT count(*) c FROM t2").head().getLong(0) == 31)
    AtomicIncrement.mergeOnReadAtomic(
      Seq((15L, "", 0.0, Option.empty[String], true))
        .toDF("k", "nm", "price", "s", "del"), sink, "k", "del")
    // no view re-creation: the standing view must see the delete
    assert(spark.sql("SELECT count(*) c FROM t2").head().getLong(0) == 30)
    assert(spark.sql("SELECT count(*) c FROM t2 WHERE k = 15")
      .head().getLong(0) == 0,
      "a tombstoned row surfaced through the SQL point read")
    // and a later append shows up too
    AtomicIncrement.appendIncrementAtomic(
      Seq((40L, "name-40", 60.0, Option("s40")))
        .toDF("k", "nm", "price", "s"), sink, "k",
      Seq("nm", "price", "s"))
    assert(spark.sql("SELECT count(*) c FROM t2").head().getLong(0) == 31)
  }

  test("SQL INSERT INTO lands as an atomic watermarked increment; " +
      "INSERT OVERWRITE replaces the snapshot; pinned views and " +
      "watermark-less views reject writes loudly") {
    val sink = tmp()
    AtomicIncrement.appendIncrementAtomic(
      (1L to 5L).map(k => (k, s"v$k")).toDF("k", "v"), sink, "k")
    sqlView(sink, "w", ", watermarkCol 'k'")
    spark.sql("INSERT INTO w VALUES (6, 'v6'), (7, 'v7')")
    assert(spark.sql("SELECT max(k) m FROM w").head().getLong(0) == 7L)
    // replay idempotence holds through SQL: re-inserting committed
    // rows is filtered by the watermark, no new version published
    val v = AtomicIncrement.snapshot(spark, sink)._1
    spark.sql("INSERT INTO w VALUES (6, 'v6'), (7, 'v7')")
    assert(AtomicIncrement.snapshot(spark, sink)._1 == v,
      "a replayed INSERT published a new version")
    assert(spark.sql("SELECT count(*) c FROM w").head().getLong(0) == 7L)
    // OVERWRITE is one OCC snapshot replace
    spark.sql("INSERT OVERWRITE w VALUES (100, 'fresh')")
    assert(spark.sql("SELECT count(*) c FROM w").head().getLong(0) == 1L)
    // a view without watermarkCol rejects INSERT INTO
    sqlView(sink, "w_ro")
    intercept[Exception](
      spark.sql("INSERT INTO w_ro VALUES (200, 'x')"))
    // a pinned view is read-only
    sqlView(sink, "w_pin", ", watermarkCol 'k', versionAsOf '1'")
    intercept[Exception](
      spark.sql("INSERT INTO w_pin VALUES (300, 'y')"))
    assert(spark.sql("SELECT count(*) c FROM w").head().getLong(0) == 1L)
    // the writer API face: append needs watermarkCol, overwrite not
    val sink2 = tmp()
    (1L to 3L).map(k => (k, k * 2)).toDF("k", "m").write
      .format("graft-atomic").option("watermarkCol", "k")
      .mode("append").save(sink2)
    Seq((4L, 8L)).toDF("k", "m").write.format("graft-atomic")
      .option("watermarkCol", "k").mode("append").save(sink2)
    assert(AtomicIncrement.readCommitted(spark, sink2).count() == 4)
    Seq((9L, 9L)).toDF("k", "m").write.format("graft-atomic")
      .mode("overwrite").save(sink2)
    assert(AtomicIncrement.readCommitted(spark, sink2).count() == 1)
    intercept[Exception](Seq((10L, 1L)).toDF("k", "m").write
      .format("graft-atomic").mode("append").save(sink2))
  }

  test("sizeInBytes reports the manifest's real bytes, so a small " +
      "graft-atomic dimension BROADCASTS in a SQL join") {
    val sink = tmp()
    AtomicIncrement.appendIncrementAtomic(
      (1L to 50L).map(k => (k, s"d$k")).toDF("k", "d"), sink, "k")
    sqlView(sink, "dim_t")
    spark.range(10000).selectExpr("id % 50 + 1 AS k", "id AS m")
      .createOrReplaceTempView("fact_t")
    val q = spark.sql(
      "SELECT count(*) c FROM fact_t f JOIN dim_t d ON f.k = d.k")
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "the KB-sized dimension did not broadcast — sizeInBytes is " +
        "reporting the default (huge) relation size")
    assert(q.head().getLong(0) == 10000L)
  }

  test("time travel options: versionAsOf, timestampAsOf (commit " +
      "stamps), and tag — each readable as plain SQL") {
    val sink = tmp()
    AtomicIncrement.appendIncrementAtomic(
      (1L to 5L).map(k => (k, s"v$k")).toDF("k", "v"), sink, "k")
    val v1 = AtomicIncrement.snapshot(spark, sink)._1
    val tAfterV1 = System.currentTimeMillis()
    AtomicIncrement.tagVersion(spark, sink, "first", v1)
    Thread.sleep(5)
    AtomicIncrement.appendIncrementAtomic(
      (6L to 9L).map(k => (k, s"v$k")).toDF("k", "v"), sink, "k")
    sqlView(sink, "t_v1", s", versionAsOf '$v1'")
    sqlView(sink, "t_ts", s", timestampAsOf '$tAfterV1'")
    sqlView(sink, "t_tag", ", tag 'first'")
    sqlView(sink, "t_now")
    for (view <- Seq("t_v1", "t_ts", "t_tag"))
      assert(spark.sql(s"SELECT max(k) m FROM $view").head().getLong(0)
        == 5L, s"$view did not pin version $v1")
    assert(spark.sql("SELECT max(k) m FROM t_now").head().getLong(0) == 9L)
    // at most one pin
    intercept[IllegalArgumentException](
      spark.read.format("graft-atomic").option("versionAsOf", "1")
        .option("tag", "first").load(sink).collect())
    // a moved tag is followed by the standing view
    AtomicIncrement.tagVersion(spark, sink,
      "first", AtomicIncrement.snapshot(spark, sink)._1, replace = true)
    assert(spark.sql("SELECT max(k) m FROM t_tag").head().getLong(0) == 9L)
  }

  test("fractional filter values against integral file stats compare " +
      "EXACTLY (round 15, ADVICE): k > -20.5 must keep a file whose " +
      "max is -20 — longValue() truncation would prune it") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}
    val sink = tmp()
    AtomicIncrement.appendIncrementAtomic(
      (-30L to -20L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartition(1), sink, "k")
    // drive buildScan directly: Catalyst's cast-unwrapping usually
    // rewrites fractional comparisons before pushdown, so the guarantee
    // must hold WITHOUT relying on that optimizer behavior
    val rel = new GraftAtomicRelation(spark.sqlContext, sink, None)
    // buildScan applies the translated filter on top of the pruned
    // file set, so `rows` is the exact predicate result and `kept`
    // pins whether the single file survived the stats verdict
    def rows(f: org.apache.spark.sql.sources.Filter): (Long, Int) = {
      val n = rel.buildScan(Array("k"), Array(f)).count()
      (n, GraftAtomicRelation.lastScanFor(sink)._1)
    }
    assert(rows(GreaterThan("k", -20.5)) == ((1L, 1)),
      "k > -20.5 wrongly pruned the file (truncated to -20)")
    assert(rows(LessThan("k", -29.5)) == ((1L, 1)),
      "k < -29.5 wrongly pruned the file (truncated to -29)")
    // a fractional equality inside the interval keeps the file (the
    // interval verdict stays conservative — it never reasons about
    // integrality) and the row-level filter returns the exact zero
    assert(rows(EqualTo("k", -25.5)) == ((0L, 1)))
    // outside the interval it prunes exactly
    assert(rows(EqualTo("k", -19.5)) == ((0L, 0)))
    assert(rows(EqualTo("k", java.math.BigDecimal.valueOf(-25L)))
      == ((1L, 1)))
    // whole-valued doubles keep the usual verdicts
    assert(rows(GreaterThan("k", -20.0)) == ((0L, 0)))
    assert(rows(GreaterThan("k", -21.0)) == ((1L, 1)))
  }

  test("a standing view's schema freezes at creation while data " +
      "follows the latest snapshot (round 15 pin): after a " +
      "schema-evolving append the old view serves new ROWS projected " +
      "to the OLD column set — stale columns, never wrong rows — and " +
      "re-creating the view surfaces the new column") {
    val sink = tmp()
    AtomicIncrement.appendIncrementAtomic(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), sink, "k")
    sqlView(sink, "t_old")
    assert(spark.table("t_old").columns.toSeq == Seq("k", "v"))
    // schema-evolving append: a new column arrives
    AtomicIncrement.appendIncrementAtomic(
      Seq((3L, "c", 9.5)).toDF("k", "v", "w"), sink, "k")
    // the standing view: new row visible, old column set (V1 resolves
    // the relation schema once at view creation; readEffective pins it
    // over the evolved files, so no read ever errors or loses rows)
    assert(spark.sql("SELECT max(k) m FROM t_old").head().getLong(0) == 3L)
    assert(spark.table("t_old").columns.toSeq == Seq("k", "v"))
    // re-created view (or a fresh reader) sees the evolved schema,
    // with the old files' missing column null-filled
    sqlView(sink, "t_new")
    assert(spark.table("t_new").columns.toSeq == Seq("k", "v", "w"))
    assert(spark.sql("SELECT w FROM t_new WHERE k = 3").head()
      .getDouble(0) == 9.5)
    assert(spark.sql("SELECT count(*) c FROM t_new WHERE w IS NULL")
      .head().getLong(0) == 2L)
  }
}
