package graft

import graft.streaming.AggStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class AggStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dirs() = {
    val root = Files.createTempDirectory("graft_aggstream")
    (Files.createDirectory(root.resolve("in")),
      root.resolve("sink").toString, root.resolve("ckpt").toString)
  }

  private def writeBatchFile(in: java.nio.file.Path, name: String,
      rows: Seq[(String, Long, Double)]): Unit = {
    val tmp = Files.createTempDirectory("graft_aggstage").toString
    rows.toDF("k", "c", "x").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, in.resolve(name))
  }

  private def runOnce(in: java.nio.file.Path, sink: String,
      ckpt: String): Unit = {
    val src = spark.readStream
      .schema("k STRING, c BIGINT, x DOUBLE").parquet(in.toString)
    val q = AggStream.rollupStream(src, sink, ckpt, Seq("k"), Seq("x"))
    assert(q.awaitTermination(120000), "stream did not finish")
    q.stop()
  }

  test("rollup folds across batches and restarts; state equals one batch groupBy") {
    val (in, sink, ckpt) = dirs()
    val b1 = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 10.0))
    val b2 = Seq(("a", 4L, 3.0), ("c", 5L, 100.0))
    writeBatchFile(in, "b1.parquet", b1)
    runOnce(in, sink, ckpt)
    // restart with nothing new: checkpoint resumes, state unchanged
    runOnce(in, sink, ckpt)
    writeBatchFile(in, "b2.parquet", b2)
    runOnce(in, sink, ckpt)
    val got = AggStream.readRollup(spark, sink, Seq("x"))
      .select("k", "n", "sum_x", "avg_x")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val expected = (b1 ++ b2).toDF("k", "c", "x")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
        avg("x").as("avg_x"))
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == expected)
  }

  test("a redelivered batch id folds to a no-op; state is unchanged") {
    val (_, sink, _) = dirs()
    val b = Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("k", "c", "x")
    assert(AggStream.foldBatch(b, 0L, sink, Seq("k"), Seq("x")) == 2L)
    val before = AggStream.readRollup(spark, sink, Seq("x"))
      .collect().map(_.toString).sorted.toSeq
    // the crash-between-publish-and-checkpoint window: same id again
    assert(AggStream.foldBatch(b, 0L, sink, Seq("k"), Seq("x")) == 0L)
    assert(AggStream.readRollup(spark, sink, Seq("x"))
      .collect().map(_.toString).sorted.toSeq == before)
    // the next id folds
    assert(AggStream.foldBatch(b, 1L, sink, Seq("k"), Seq("x")) == 2L)
    assert(AggStream.readRollup(spark, sink, Seq("x"))
      .filter($"k" === "a").head().getAs[Long]("n") == 2L)
  }

  test("late values fold (batch-id idempotence, not a watermark filter)") {
    val (_, sink, _) = dirs()
    // batch 0 carries HIGHER values than batch 1 — a watermark-ordered
    // replay filter would drop batch 1 entirely; batch-id idempotence
    // must fold it
    assert(AggStream.foldBatch(Seq(("a", 9L, 9.0)).toDF("k", "c", "x"),
      0L, sink, Seq("k"), Seq("x")) == 1L)
    assert(AggStream.foldBatch(Seq(("a", 1L, 1.0)).toDF("k", "c", "x"),
      1L, sink, Seq("k"), Seq("x")) == 1L)
    val row = AggStream.readRollup(spark, sink, Seq("x"))
      .filter($"k" === "a").head()
    assert(row.getAs[Long]("n") == 2L && row.getAs[Double]("sum_x") == 10.0)
  }
}
