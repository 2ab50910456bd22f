package graft

import graft.operators.AtomicIncrement
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 SQL maintenance + observability surface:
  * `CALL graft.system.<proc>(…)` stored procedures (optimize, vacuum,
  * expire_manifests, tag, drop_tag) and the Iceberg-style metadata
  * tables (`graft.`<path>`.history` / `.detail` / `.files` /
  * `.tags`). Each CALL returns the summary row a maintenance log
  * records; each metadata table mirrors its API face exactly.
  */
class GraftProceduresSpec extends SparkSpec {
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

  private def loadThree(sink: String): Unit =
    for ((lo, hi) <- Seq((1, 40), (41, 80), (81, 120)))
      AtomicIncrement.appendIncrementAtomic(
        rows(lo, hi).repartition(1), sink, "k")

  test("CALL graft.system.optimize compacts past the trigger and " +
      "reports the pass; named arguments bind") {
    install()
    val sink = tmp("graft_proc_opt")
    try {
      loadThree(sink)
      val r = spark.sql(
        s"""CALL graft.system.optimize(
           |  table_path => '$sink', target_files => 1,
           |  cluster_by => 'k')""".stripMargin).head()
      assert(r.getAs[Int]("files_before") == 3)
      assert(r.getAs[Int]("files_after") == 1)
      assert(r.getAs[Boolean]("rewrote"))
      // the table still answers, rows preserved
      assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$sink`")
        .head().getLong(0) == 120L)
    } finally rm(sink)
  }

  test("CALL graft.system.vacuum reclaims orphaned staging; " +
      "positional arguments bind too") {
    install()
    val sink = tmp("graft_proc_vac")
    try {
      loadThree(sink)
      // plant an orphan batch dir (a crashed stage's leftovers)
      val fs = new org.apache.hadoop.fs.Path(sink).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val orphan = new org.apache.hadoop.fs.Path(
        s"$sink/_data/batch-orphan-test")
      fs.mkdirs(orphan)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(orphan, "junk.parquet"), true)
      out.write(Array[Byte](1, 2, 3)); out.close()
      val r = spark.sql(s"CALL graft.system.vacuum('$sink')").head()
      assert(r.getAs[Int]("orphan_dirs_removed") == 1)
      assert(!fs.exists(orphan))
      assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$sink`")
        .head().getLong(0) == 120L)
    } finally rm(sink)
  }

  test("CALL graft.system.tag pins the latest version by default; " +
      "expire_manifests honors it; drop_tag releases") {
    install()
    val sink = tmp("graft_proc_tag")
    try {
      loadThree(sink) // versions 1..3
      val t = spark.sql(
        s"CALL graft.system.tag('$sink', 'rc-one')").head()
      assert(t.getAs[String]("name") == "rc-one")
      assert(t.getAs[Long]("version") == 3L)
      // pin an OLD version explicitly, then expire: it must survive
      spark.sql(
        s"CALL graft.system.tag('$sink', 'first', 1)")
      val e = spark.sql(
        s"CALL graft.system.expire_manifests('$sink', 1)").head()
      assert(e.getAs[Int]("expired") == 1, // v2 retired; v1 tagged, v3 latest
        s"expected exactly v2 to expire, got ${e.getAs[Int]("expired")}")
      // tagged old version still readable through SQL time travel
      assert(spark.sql(
        s"SELECT count(*) AS n FROM graft.`$sink` VERSION AS OF 'first'")
        .head().getLong(0) == 40L)
      val d = spark.sql(
        s"CALL graft.system.drop_tag('$sink', 'first')").head()
      assert(d.getAs[Boolean]("dropped"))
      // an unknown procedure refuses loudly (Spark wraps the
      // catalog's message in FAILED_TO_LOAD_ROUTINE)
      val ex = intercept[Exception] {
        spark.sql(s"CALL graft.system.nonsense('$sink')")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(ex).exists(m => m.contains("optimize") ||
          m.contains("Failed to load routine")),
        msgs(ex).mkString(" | "))
    } finally rm(sink)
  }

  test("SHOW PROCEDURES lists the system namespace; DESCRIBE " +
      "PROCEDURE answers for each") {
    install()
    val listed = spark.sql("SHOW PROCEDURES IN graft.system")
      .collect().map(_.toSeq.map(String.valueOf).mkString(" ")).toSeq
    for (p <- Seq("optimize", "vacuum", "expire_manifests", "tag",
        "drop_tag"))
      assert(listed.exists(_.contains(p)), s"'$p' missing from $listed")
    val desc = spark.sql("DESCRIBE PROCEDURE graft.system.optimize")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("optimize"), desc)
  }

  test("metadata tables: history / detail / files / tags mirror the " +
      "API faces through plain SQL") {
    install()
    val sink = tmp("graft_proc_meta")
    try {
      loadThree(sink)
      spark.sql(s"CALL graft.system.tag('$sink', 'pin-a', 2)")
      val hist = spark.sql(
        s"SELECT version, files FROM graft.`$sink`.history " +
          "ORDER BY version").collect()
      assert(hist.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Seq((1L, 1), (2L, 2), (3L, 3)))
      val det = spark.sql(s"SELECT * FROM graft.`$sink`.detail").head()
      assert(det.getAs[Long]("version") == 3L)
      assert(det.getAs[Int]("files") == 3)
      assert(det.getAs[Long]("rows") == 120L)
      assert(det.getAs[scala.collection.Seq[String]]("tags").toSeq ==
        Seq("pin-a@2"))
      val files = spark.sql(
        s"SELECT path, is_dv, row_count FROM graft.`$sink`.files")
        .collect()
      assert(files.length == 3)
      assert(files.forall(!_.getBoolean(1)))
      assert(files.map(_.getLong(2)).sum == 120L)
      val tags = spark.sql(
        s"SELECT name, version FROM graft.`$sink`.tags").collect()
      assert(tags.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("pin-a", 2L)))
      // aggregation over a metadata table composes like any relation
      assert(spark.sql(
        s"SELECT sum(files) AS s FROM graft.`$sink`.history")
        .head().getLong(0) == 6L)
    } finally rm(sink)
  }

  test("a REAL warehouse table named 'history' beats the metadata " +
      "suffix; missing parent stays NoSuchTable") {
    val wh = tmp("graft_proc_wh")
    try {
      spark.conf.set("spark.sql.catalog.graftw",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graftw.warehouse", wh)
      // ns 'orders' with a real CHILD TABLE named history under it:
      // identifier graftw.orders.history must resolve to the real one
      AtomicIncrement.appendIncrementAtomic(
        rows(1, 10).repartition(1), s"$wh/orders", "k")
      AtomicIncrement.appendIncrementAtomic(
        rows(1, 7).repartition(1), s"$wh/orders/history", "k")
      assert(spark.sql(
        "SELECT count(*) AS n FROM graftw.orders.history")
        .head().getLong(0) == 7L)
      // without the real child, the suffix serves the metadata view
      AtomicIncrement.appendIncrementAtomic(
        rows(1, 5).repartition(1), s"$wh/plain", "k")
      val h = spark.sql(
        "SELECT version, files FROM graftw.plain.history").collect()
      assert(h.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Seq((1L, 1)))
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT * FROM graftw.nothere.history").collect()
      }
      ()
    } finally rm(wh)
  }
}
