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

  test("compaction crash between fold-write and delete: replay collapses " +
      "the duplicated rows instead of accumulating them") {
    val base = java.nio.file.Files.createTempDirectory("graft_ccrash")
    val index = base.resolve("index").toString
    val sink = base.resolve("sink").toString
    def doc(i: Int): (Long, String) =
      (i.toLong, (0 until 12).map(t => s"c${i}y$t").mkString(" "))
    def step(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.nearDedupBatchStep(
        rows.toDF("doc_id", "text"), id, index, sink,
        minJaccard = 0.8, compactEvery = 3)
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val it = java.nio.file.Files.walk(from).iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).foreach { p =>
        val dst = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    step(Seq(doc(1), doc(2)), 0L)
    step(Seq(doc(3)), 1L)
    step(Seq(doc(4)), 2L)
    // snapshot the pre-compaction index, then compact at batch 3
    val snap = base.resolve("snap")
    copyTree(java.nio.file.Paths.get(index), snap)
    val b3 = Seq(doc(5))
    step(b3, 3L)
    // simulate the crash window: fold partition batch=3 exists AND the
    // pre-compaction partitions are back (delete never ran)
    copyTree(snap, java.nio.file.Paths.get(index))
    // drop the inferred batch=<id> partition column so row identity is
    // the index payload, not the directory the row happens to live in
    val bandsDup = spark.read.parquet(s"$index/bands").drop("batch")
    assert(bandsDup.count() > bandsDup.distinct().count(),
      "precondition: crash state must actually duplicate rows")
    // replay batch 3: the fold must distinct() the duplicates away and
    // the delete must clear the old partitions
    step(b3, 3L)
    val bands = spark.read.parquet(s"$index/bands").drop("batch")
    assert(bands.count() == bands.distinct().count(),
      "replayed fold left duplicate band rows")
    val shingles = spark.read.parquet(s"$index/shingles").drop("batch")
    assert(shingles.count() == shingles.distinct().count(),
      "replayed fold left duplicate shingle rows")
    def partsUnder(sub: String): Seq[String] = {
      val it = java.nio.file.Files.list(
        java.nio.file.Paths.get(index, sub)).iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq
    }
    assert(partsUnder("bands") == Seq("batch=3"))
    assert(partsUnder("shingles") == Seq("batch=3"))
    // admission is still exact after the replayed compaction: a near-dup
    // of a batch-0 doc is dropped, a fresh doc admitted
    step(Seq((50L, doc(1)._2 + " tail"), doc(6)), 4L)
    val ids = spark.read.parquet(sink)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("benchmark gate keeps contaminated docs out of sink AND index") {
    val base = java.nio.file.Files.createTempDirectory("graft_cs_bm")
    val index = base.resolve("index").toString
    val sink = base.resolve("sink").toString
    val gate = graft.streaming.BenchmarkGate.fromDocs(
      Seq(Tuple1(baseA.toUpperCase)).toDF("text")) // normalized-fp match
    def step(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.nearDedupBatchStep(rows.toDF("doc_id", "text"), id,
        index, sink, minJaccard = 0.8, benchmark = Some(gate))
    // doc 1 IS the benchmark doc (case differs): dropped by the gate,
    // and because it never enters the index, doc 2 — a legitimate
    // near-dup of the contaminated doc — is still admitted
    step(Seq((1L, baseA), (3L, baseB)), 0L)
    step(Seq((2L, baseA + " nu")), 1L)
    val ids = spark.read.parquet(sink)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L))
  }
}
