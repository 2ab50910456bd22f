package graft

import graft.operators.AtomicIncrement
import graft.sources.GraftAtomicRelation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DSv2 catalog face (`spark.sql.catalog.graft`): SELECT through
  * the V1Scan bridge (manifest pruning engaged from SQL WHERE),
  * row-level DELETE via SupportsDeleteV2 (carried-files-verbatim,
  * dv-aware, NULL-cond semantics), TRUNCATE, no-match no-op, loud
  * refusals for the unsupported DDL surface.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    ()
  }

  private def install(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo to hi).map(k => (k.toLong, s"g${k % 3}", k * 1.5))
      .toDF("k", "grp", "amt")

  /** Three disjoint-interval increments: files prune on k. */
  private def loadThree(sink: String): Unit =
    for ((lo, hi) <- Seq((1, 40), (41, 80), (81, 120)))
      AtomicIncrement.appendIncrementAtomic(rows(lo, hi), sink, "k")

  test("SELECT through the catalog prunes files from the SQL WHERE " +
      "and returns exact rows") {
    install()
    val sink = tmp("graft_cat_sel")
    try {
      loadThree(sink)
      val got = spark.sql(
        s"SELECT grp, count(*) AS n, sum(amt) AS s FROM graft.`$sink` " +
          "WHERE k > 80 GROUP BY grp ORDER BY grp").collect()
      val want = rows(81, 120).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("amt").as("s"))
        .orderBy("grp").collect()
      assert(got.toSeq.map(_.toSeq) === want.toSeq.map(_.toSeq))
      // the WHERE pruned to the third increment's files only
      val (kept, committed) = GraftAtomicRelation.lastScanFor(sink)
      assert(committed === AtomicIncrement.committedFiles(spark, sink).size)
      assert(kept < committed, s"no pruning engaged: $kept of $committed")
    } finally rm(sink)
  }

  test("DELETE FROM rewrites only may-match files, carries the rest " +
      "verbatim, and survives NULL-cond rows") {
    install()
    val sink = tmp("graft_cat_del")
    try {
      loadThree(sink)
      // one row with NULL amt in the hot range: `amt < 100` is NULL
      // there, and SQL DELETE must keep it
      AtomicIncrement.appendIncrementAtomic(
        Seq((121L, "g0", null.asInstanceOf[java.lang.Double]))
          .toDF("k", "grp", "amt"), sink, "k")
      val before = AtomicIncrement.committedFiles(spark, sink).toSet
      spark.sql(s"DELETE FROM graft.`$sink` WHERE k > 80 AND amt < 150")
      val after = AtomicIncrement.committedFiles(spark, sink).toSet
      // files of the first two increments (k <= 80) carried verbatim
      val carried = before.intersect(after)
      assert(carried.nonEmpty, "nothing carried: pruning regressed")
      assert(before.diff(after).nonEmpty, "nothing rewritten")
      val got = AtomicIncrement.readCommitted(spark, sink)
      // survivors: everything k<=80, k>80 rows with amt>=150, and the
      // NULL-amt row (cond NULL -> survives)
      val expected = rows(1, 120).filter($"k" <= 80 || $"amt" >= 150)
        .select($"k").as[Long].collect().toSet + 121L
      assert(got.select("k").as[Long].collect().toSet === expected)
      assert(got.filter($"k" === 121L).count() === 1L,
        "NULL-cond row must survive a SQL DELETE")
    } finally rm(sink)
  }

  test("DELETE on a merge-on-read table respects standing delete " +
      "vectors and the rewrite outranks them") {
    install()
    val sink = tmp("graft_cat_delmor")
    try {
      loadThree(sink)
      // defer-delete k in [100, 110] via MoR (dv only, no rewrite)
      AtomicIncrement.mergeOnReadAtomic(
        rows(100, 110).withColumn("del", lit(true)), sink, "k", "del")
      // SQL DELETE of k > 90 with amt < 160 — overlaps the dv range
      spark.sql(s"DELETE FROM graft.`$sink` WHERE k > 90 AND amt < 160")
      val got = AtomicIncrement.readCommitted(spark, sink)
        .select("k").as[Long].collect().toSet
      val expected = rows(1, 120)
        .filter(!($"k" >= 100 && $"k" <= 110)) // dv-masked first
        .filter(!($"k" > 90 && $"amt" < 160))  // then the SQL delete
        .select($"k").as[Long].collect().toSet
      assert(got === expected)
    } finally rm(sink)
  }

  test("no-match DELETE publishes no new version; DELETE without " +
      "WHERE empties the table") {
    install()
    val sink = tmp("graft_cat_noop")
    try {
      loadThree(sink)
      val v0 = AtomicIncrement.snapshot(spark, sink)._1
      spark.sql(s"DELETE FROM graft.`$sink` WHERE k > 99999")
      assert(AtomicIncrement.snapshot(spark, sink)._1 === v0,
        "a no-match delete must be a free no-op")
      spark.sql(s"DELETE FROM graft.`$sink`")
      assert(AtomicIncrement.readCommitted(spark, sink).count() === 0L)
    } finally rm(sink)
  }

  test("catalog scan reports manifest-true statistics and a small " +
      "catalog table broadcasts in a SQL join") {
    install()
    val small = tmp("graft_cat_dim")
    val big = tmp("graft_cat_fact")
    try {
      AtomicIncrement.appendIncrementAtomic(
        (1 to 20).map(k => (k.toLong, s"name$k")).toDF("k", "label"),
        small, "k")
      AtomicIncrement.appendIncrementAtomic(
        (1 to 5000).map(i => (i.toLong, (i % 20 + 1).toLong, i * 1.0))
          .toDF("id", "k", "amt"), big, "id")
      // the DSv2 scan's estimateStatistics: exact rows from the
      // manifest row-count groups, real bytes from the file list
      val scan = new graft.sources.GraftScanBuilder(small,
        AtomicIncrement.readCommitted(spark, small).schema).build()
      val stats = scan
        .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
      assert(stats.numRows().getAsLong === 20L)
      assert(stats.sizeInBytes().getAsLong > 0L)
      // without stats a V2 relation reports defaultSizeInBytes (huge)
      // and this join would sort-merge; with them it broadcasts
      val plan = spark.sql(
        s"SELECT sum(b.amt) FROM graft.`$big` b " +
          s"JOIN graft.`$small` s ON b.k = s.k")
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"catalog join did not broadcast:\n$plan")
    } finally { rm(small); rm(big) }
  }

  test("a WHERE that folds to false is provably-no-match: no file " +
      "touched, no version published (AlwaysFalse prunes everything)") {
    install()
    val sink = tmp("graft_cat_false")
    try {
      loadThree(sink)
      val v0 = AtomicIncrement.snapshot(spark, sink)._1
      // the verdict itself: AlwaysFalse proves emptiness whatever the
      // entry's stats — even a stats-free path-only line prunes
      val bare = AtomicIncrement.ManifestEntry("part-0.parquet", Nil)
      assert(!graft.sources.ManifestPruning.mayMatch(bare,
        org.apache.spark.sql.sources.AlwaysFalse()))
      // and through SQL: before the AlwaysFalse case, this rewrote
      // EVERY file as a no-op and published a new version
      spark.sql(s"DELETE FROM graft.`$sink` WHERE 1 = 0")
      assert(AtomicIncrement.snapshot(spark, sink)._1 === v0,
        "a folded-false WHERE must publish nothing")
      assert(AtomicIncrement.readCommitted(spark, sink).count() === 120L)
    } finally rm(sink)
  }

  test("a row-multiplying subtree (Generate) above a small graft leaf " +
      "is never broadcast-hinted — leaf bytes don't bound its output") {
    install()
    val small = tmp("graft_cat_dim2")
    val big = tmp("graft_cat_fact2")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val threshold0 = spark.conf.get(thresholdKey)
    try {
      AtomicIncrement.appendIncrementAtomic(
        (1 to 20).map(k => (k.toLong, s"name$k")).toDF("k", "label"),
        small, "k")
      AtomicIncrement.appendIncrementAtomic(
        (1 to 5000).map(i => (i.toLong, (i % 20 + 1).toLong, i * 1.0))
          .toDF("id", "k", "amt"), big, "id")
      // pin the threshold BETWEEN the two tables' manifest bytes so
      // only the dim side could ever qualify — then put an explode
      // between the join and the dim leaf: the leaf byte sum no
      // longer upper-bounds the side's output, and a forced
      // JoinHint(BROADCAST) would override runtime size entirely, so
      // the rule must decline and the join must sort-merge
      spark.conf.set(thresholdKey, "10240")
      val plan = spark.sql(
        s"SELECT sum(b.amt) FROM graft.`$big` b JOIN " +
          s"(SELECT explode(array(k, k)) AS k FROM graft.`$small`) s " +
          "ON b.k = s.k")
        .queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"row-multiplying side must not be force-broadcast:\n$plan")
      // control: the SAME tables and threshold with the bare dim side
      // still broadcast — the guard bites on the subtree shape, not
      // on the threshold pin
      val bare = spark.sql(
        s"SELECT sum(b.amt) FROM graft.`$big` b " +
          s"JOIN graft.`$small` s ON b.k = s.k")
        .queryExecution.sparkPlan.toString
      assert(bare.contains("BroadcastHashJoin"),
        s"bare dim side should still broadcast:\n$bare")
    } finally {
      spark.conf.set(thresholdKey, threshold0)
      rm(small); rm(big)
    }
  }

  test("an all-digit tag name refuses at creation — SQL VERSION AS OF " +
      "owns the digit namespace, so no tag can be shadowed") {
    install()
    val sink = tmp("graft_cat_digtag")
    try {
      loadThree(sink)
      val ex = intercept[IllegalArgumentException] {
        AtomicIncrement.tagVersion(spark, sink, "123",
          AtomicIncrement.snapshot(spark, sink)._1)
      }
      assert(ex.getMessage.contains("all digits"))
      // a digit-CARRYING name is fine and resolves from SQL
      AtomicIncrement.tagVersion(spark, sink, "v1-frozen", 1L)
      assert(spark.sql(s"SELECT count(*) FROM graft.`$sink` " +
        "VERSION AS OF 'v1-frozen'").head().getLong(0) === 40L)
    } finally rm(sink)
  }

  test("warehouse-rooted names resolve and listTables surfaces only " +
      "real committed tables") {
    val wh = tmp("graft_cat_wh")
    try {
      // two real tables plus a decoy dir with no committed manifest
      AtomicIncrement.appendIncrementAtomic(
        (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "amt"),
        s"$wh/db1/t1", "k")
      AtomicIncrement.appendIncrementAtomic(
        (1 to 5).map(i => (i.toLong, i * 2.0)).toDF("k", "amt"),
        s"$wh/db1/t2", "k")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$wh/db1/not_a_table"))
      val cat = new graft.sources.GraftCatalog
      cat.initialize("gw",
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.singletonMap("warehouse", wh)))
      val listed = cat.listTables(Array("db1")).map(_.name).sorted
      assert(listed.toSeq === Seq("t1", "t2"))
      val t1 = cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("db1"), "t1"))
      assert(t1.schema().fieldNames.toSeq === Seq("k", "amt"))
      intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
        cat.loadTable(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            Array("db1"), "not_a_table"))
      }
      intercept[org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException] {
        cat.listTables(Array("nope"))
      }
    } finally rm(wh)
  }

  test("unsupported DDL refuses loudly; missing table is " +
      "NoSuchTable; DROP TABLE removes the sink") {
    install()
    val sink = tmp("graft_cat_ddl")
    try {
      loadThree(sink)
      // ADD COLUMN became first-class in round 17 (GraftSqlEvolveSpec);
      // the destructive ALTERs still refuse
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$sink` DROP COLUMN grp")
      }
      assert(e.getMessage.contains("not supported") ||
        Option(e.getCause).exists(_.getMessage.contains("not supported")))
      val missing = tmp("graft_cat_missing")
      try intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT * FROM graft.`$missing/nope`").collect()
      } finally rm(missing)
      spark.sql(s"DROP TABLE graft.`$sink`")
      assert(AtomicIncrement.snapshot(spark, sink)._2.isEmpty)
    } finally rm(sink)
  }
}
