package graft

import graft.sources.{KnownPageCount, Rest, RestTransport}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Test transports for the DSv2 partitioned REST source. Instantiated
  * by class name inside partition readers; the companion counters are
  * observable here because local-mode executors share the JVM.
  */
object FakeFeeds {
  val TotalRows = 4321
  @volatile var fetches = 0
  @volatile var failuresLeft = 0
  def item(i: Long): String = s"""{"id":$i,"name":"row$i"}"""
}

/** 4321 rows served in limit/offset pages, with a KnownPageCount. */
class FakeFeedTransport extends RestTransport with KnownPageCount {
  override def pageCount(pageSize: Int): Long =
    (FakeFeeds.TotalRows + pageSize - 1) / pageSize
  override def fetch(offset: Long, limit: Int): Rest.Page[String] = {
    FakeFeeds.synchronized { FakeFeeds.fetches += 1 }
    val ids = offset until math.min(offset + limit, FakeFeeds.TotalRows.toLong)
    Rest.Page(ids.map(FakeFeeds.item))
  }
}

/** First N fetches fail with a retryable 503, then delegates. */
class FlakyFeedTransport extends FakeFeedTransport {
  override def fetch(offset: Long, limit: Int): Rest.Page[String] = {
    val fail = FakeFeeds.synchronized {
      if (FakeFeeds.failuresLeft > 0) { FakeFeeds.failuresLeft -= 1; true }
      else false
    }
    if (fail) throw Rest.HttpError(503)
    super.fetch(offset, limit)
  }
}

/** Claims 40 pages but the feed dries up after 123 rows — the reader
  * must stop on the short page instead of fetching the planned tail.
  */
class ShrunkFeedTransport extends RestTransport {
  override def fetch(offset: Long, limit: Int): Rest.Page[String] = {
    FakeFeeds.synchronized { FakeFeeds.fetches += 1 }
    val ids = offset until math.min(offset + limit, 123L)
    Rest.Page(ids.map(FakeFeeds.item))
  }
}

/** One full page, then empty pages that still carry a stale
  * hasNext=true hint — the empty page must end the range anyway
  * (the `Rest.paginate` rule).
  */
class StaleHintTransport extends RestTransport {
  override def fetch(offset: Long, limit: Int): Rest.Page[String] = {
    FakeFeeds.synchronized { FakeFeeds.fetches += 1 }
    if (offset >= 100) Rest.Page(Seq.empty, hasNext = true)
    else Rest.Page((offset until offset + limit).map(FakeFeeds.item),
      hasNext = true)
  }
}

class RestDsv2Spec extends SparkSpec {

  private val itemSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def read(transport: Class[_], opts: (String, String)*) = {
    val r = spark.read.format("graft-rest")
      .option("transport", transport.getName)
      .option("pageSize", "100")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("partitioned read: every page fetched exactly once, rows parse " +
      "through from_json, partition count follows pagesPerPartition") {
    FakeFeeds.fetches = 0
    val df = read(classOf[FakeFeedTransport], "pagesPerPartition" -> "8")
    assert(df.rdd.getNumPartitions == 6) // ceil(44 pages / 8)
    val parsed = df.select(from_json(col("value"), itemSchema).as("r"))
      .select("r.*")
    assert(parsed.count() == FakeFeeds.TotalRows)
    assert(FakeFeeds.fetches == 44) // ceil(4321/100): once per page
    // content survives the JSON round trip, not just the row count
    val s = parsed.agg(sum("id")).head().getLong(0)
    assert(s == FakeFeeds.TotalRows.toLong * (FakeFeeds.TotalRows - 1) / 2)
  }

  test("limit pushdown: pages past the limit are never fetched and the " +
      "straddling page is row-capped") {
    FakeFeeds.fetches = 0
    val df = read(classOf[FakeFeedTransport]).limit(250)
    assert(df.count() == 250)
    // 250 rows at pageSize 100 → 3 planned pages, not 44
    assert(FakeFeeds.fetches == 3, s"fetched ${FakeFeeds.fetches} pages")
    assert(read(classOf[FakeFeedTransport]).limit(250)
      .queryExecution.executedPlan.toString.contains("graft-rest"))
  }

  test("retryable failures are retried per the reference policy") {
    FakeFeeds.fetches = 0
    FakeFeeds.failuresLeft = 2
    val n = read(classOf[FlakyFeedTransport], "pages" -> "2").count()
    assert(n == 200)
    assert(FakeFeeds.failuresLeft == 0)
  }

  test("a short page ends the partition early when the feed shrank " +
      "after planning") {
    FakeFeeds.fetches = 0
    val df = read(classOf[ShrunkFeedTransport], "pages" -> "40",
      "pagesPerPartition" -> "40")
    assert(df.count() == 123)
    // pages 0 (full) and 1 (short, 23 rows) fetched; 2-39 skipped
    assert(FakeFeeds.fetches == 2, s"fetched ${FakeFeeds.fetches} pages")
  }

  test("an empty page ends the range even under a stale hasNext hint") {
    FakeFeeds.fetches = 0
    val df = read(classOf[StaleHintTransport], "pages" -> "40",
      "pagesPerPartition" -> "40")
    assert(df.count() == 100)
    // page 0 (full, hasNext) and page 1 (empty) fetched; 2-39 skipped
    assert(FakeFeeds.fetches == 2, s"fetched ${FakeFeeds.fetches} pages")
  }

  test("missing transport or page bound fails fast at planning") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft-rest").load().count()
    }
    intercept[IllegalArgumentException] {
      read(classOf[ShrunkFeedTransport]).count() // no pages, no KnownPageCount
    }
  }
}
