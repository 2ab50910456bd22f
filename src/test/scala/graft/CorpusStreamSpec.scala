package graft

import graft.streaming.CorpusStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming near-dup dedup: first-arrival-wins admission against the
  * persistent band index, batch-internal min-id dedup, exactly-once
  * file ingestion across restarts.
  */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // 12-token base sentences; appending a token keeps 3-gram Jaccard at
  // 10/11 ≈ 0.91 ≥ 0.8 — a planted near-dup the LSH bands must catch
  private val baseA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val baseB = "one two three four five six seven eight nine ten eleven twelve"
  private val baseD = "red orange yellow green blue indigo violet cyan magenta white black gray"

  test("stream admits first arrivals, drops cross-batch and in-batch near-dups") {
    val base = java.nio.file.Files.createTempDirectory("graft_cstream")
    val in = base.resolve("in"); java.nio.file.Files.createDirectories(in)
    val index = base.resolve("index").toString
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString

    def runOnce(): Unit = {
      val src = spark.readStream.schema(docSchema).parquet(in.toString)
      val q = CorpusStream.nearDedupStream(src, index, sink, ckpt)
      assert(q.awaitTermination(180000), "stream did not finish")
      q.stop()
    }
    def sinkIds: Set[Long] =
      spark.read.parquet(sink).select("doc_id").as[Long].collect().toSet

    // the file source lists FILES, not nested write directories — land
    // each batch as one flat parquet file
    def landBatch(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cs_b")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.parquet(tmp.resolve("d").toString)
      val part = java.nio.file.Files.list(tmp.resolve("d")).iterator()
      val file = Iterator.continually(part)
        .takeWhile(_.hasNext).map(_.next())
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(file, in.resolve(name))
    }

    // batch 1: two unrelated docs
    landBatch(Seq((1L, baseA), (2L, baseB)), "b1.parquet")
    runOnce()
    assert(sinkIds == Set(1L, 2L))

    // batch 2: near-dup of doc 1 (dropped via the index), a brand-new
    // doc (admitted), and an in-batch near-dup pair (min id 4 wins)
    landBatch(Seq(
      (3L, baseA + " nu"),
      (4L, baseD),
      (5L, baseD + " extra")), "b2.parquet")
    runOnce()
    assert(sinkIds == Set(1L, 2L, 4L))

    // restart with no new data: exactly-once, nothing reprocessed
    runOnce()
    assert(sinkIds == Set(1L, 2L, 4L))

    // batch 3: near-dups of docs admitted in two DIFFERENT earlier
    // batches — both dropped via the accumulated index
    landBatch(Seq(
      (6L, baseD + " shade"),
      (7L, baseB + " thirteen")), "b3.parquet")
    runOnce()
    assert(sinkIds == Set(1L, 2L, 4L))

    // admitted corpus carries no near-dup pair at all (the invariant)
    val admitted = spark.read.parquet(sink)
    val pairs = graft.operators.Dedup.minhashNearDups(
      admitted, "doc_id", "text", minJaccard = 0.8)
    assert(pairs.count() == 0)
    // and the index holds bands for exactly the admitted docs
    val indexed = spark.read.parquet(s"$index/bands")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == sinkIds)
  }

  test("replayed micro-batch is a no-op; compaction bounds index partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_cstep")
    val index = base.resolve("index").toString
    val sink = base.resolve("sink").toString
    // 12 unique tokens per doc → disjoint 3-gram shingles across docs
    def doc(i: Int): (Long, String) =
      (i.toLong, (0 until 12).map(t => s"w${i}x$t").mkString(" "))
    def step(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.nearDedupBatchStep(
        rows.toDF("doc_id", "text"), id, index, sink,
        minJaccard = 0.8, compactEvery = 3)
    def sinkIds: Seq[Long] =
      spark.read.parquet(sink).select("doc_id").as[Long].collect().toSeq.sorted
    def bandPartDirs: Seq[String] = {
      val d = java.nio.file.Paths.get(index, "bands")
      val it = java.nio.file.Files.list(d).iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq
    }

    step(Seq(doc(1), doc(2)), 0L)
    // batch 1: a near-dup of doc 1 (dropped via the index) + fresh doc 3
    val nearDup1 = (10L, doc(1)._2 + " extra")
    step(Seq(nearDup1, doc(3)), 1L)
    assert(sinkIds == Seq(1L, 2L, 3L))
    // REPLAY batch 1 (crash before checkpoint commit): the sink must
    // not double-append, and the index leftovers of the first attempt
    // must not self-match doc 3 out of the corpus
    step(Seq(nearDup1, doc(3)), 1L)
    assert(sinkIds == Seq(1L, 2L, 3L))
    // five more unique-doc batches; compaction fires at ids 3 and 6
    for (i <- 2 to 6) step(Seq(doc(10 + i)), i.toLong)
    assert(sinkIds == Seq(1L, 2L, 3L, 12L, 13L, 14L, 15L, 16L))
    assert(bandPartDirs.size <= 3, s"index partitions unbounded: $bandPartDirs")
    // the folded index still drops a near-dup of a batch-0 doc
    step(Seq((99L, doc(2)._2 + " tail")), 7L)
    assert(sinkIds == Seq(1L, 2L, 3L, 12L, 13L, 14L, 15L, 16L))
    // and holds bands for exactly the admitted docs
    val indexed = spark.read.parquet(s"$index/bands")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == sinkIds.toSet)
  }
}
