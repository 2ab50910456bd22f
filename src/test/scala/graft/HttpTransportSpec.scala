package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{Http, HttpRestTransport, Rest}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll

/** Shared state between the stub server and the executor-side
  * transport (local-mode executors share the JVM, so the class-name
  * instantiated transport can read the dynamically-bound port).
  */
object StubFeed {
  val Total = 237L
  @volatile var port: Int = 0
  @volatile var flaky429Left = 0
  @volatile var flaky500Left = 0
  @volatile var requests = 0
  @volatile var lastAccept: String = ""
  def item(i: Long): String = s"""{"id":$i,"name":"row$i"}"""
}

/** The live-transport subclass under test: no-arg constructor + a
  * Config pointing at the stub — exactly the shape a real feed ships.
  */
class StubFeedTransport extends HttpRestTransport {
  override def config: Http.Config =
    Http.Config(s"http://127.0.0.1:${StubFeed.port}/feed")
}

/** The self-planning variant: page count probed from the envelope's
  * `total` field, no `pages` option needed.
  */
class StubCountedTransport extends graft.sources.HttpCountedRestTransport {
  override def config: Http.Config =
    Http.Config(s"http://127.0.0.1:${StubFeed.port}/feed")
}

/** Counted transport pointed at a field the envelope doesn't carry. */
class BadTotalTransport extends StubCountedTransport {
  override def totalField: String = "no_such_field"
}

/** VERDICT r9 #3: the REST protocol through the REAL
  * `java.net.http.HttpClient` default transport, against an in-process
  * stub server — live sockets, live status codes, live headers; the
  * only fake left is the endpoint itself.
  */
class HttpTransportSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _

  private def respond(x: HttpExchange, status: Int, body: String,
      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => x.getResponseHeaders.add(k, v) }
    val b = body.getBytes(UTF_8)
    x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) x.getResponseBody.write(b)
    x.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // the reference feed: ?limit=&offset=, {"content":[...],
    // "paging":{"next":bool}}, with injectable 429/500 episodes
    server.createContext("/feed", (x: HttpExchange) => {
      StubFeed.synchronized { StubFeed.requests += 1 }
      val fail429 = StubFeed.synchronized {
        if (StubFeed.flaky429Left > 0) { StubFeed.flaky429Left -= 1; true }
        else false
      }
      lazy val fail500 = StubFeed.synchronized {
        if (StubFeed.flaky500Left > 0) { StubFeed.flaky500Left -= 1; true }
        else false
      }
      if (fail429) respond(x, 429, "", "Retry-After" -> "0")
      else if (fail500) respond(x, 500, "boom")
      else {
        val q = x.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val offset = q("offset").toLong
        val limit = q("limit").toInt
        val ids = offset until math.min(offset + limit, StubFeed.Total)
        val body = ids.map(StubFeed.item).mkString(
          """{"content":[""", ",",
          s"""],"total":${StubFeed.Total},""" +
            s""""paging":{"next":${offset + limit < StubFeed.Total}}}""")
        respond(x, 200, body, "Content-Type" -> "application/json")
      }
    })
    // the SharePoint odata=verbose envelope, Accept header recorded
    server.createContext("/siteusers", (x: HttpExchange) => {
      StubFeed.lastAccept = x.getRequestHeaders.getFirst("Accept")
      respond(x, 200,
        """{"d":{"results":[
          |{"Id":1,"Title":"Ada","Email":"ada@x","LoginName":"dom\\ada","extra":9},
          |{"Id":2,"Title":"Bob","Email":"bob@x","LoginName":"dom\\bob"}]}}"""
          .stripMargin, "Content-Type" -> "application/json;odata=verbose")
    })
    server.start()
    StubFeed.port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  test("Rest.paginate through the live client: full feed, 429/500 retried per policy") {
    StubFeed.synchronized {
      StubFeed.flaky429Left = 1; StubFeed.flaky500Left = 1
    }
    var sleeps = List.empty[Long]
    val items = Rest.paginate(100,
      Http.pageFetcher(Http.Config(s"http://127.0.0.1:${StubFeed.port}/feed")),
      sleep = ms => sleeps ::= ms).toList
    assert(items.size == StubFeed.Total)
    assert(items.head == StubFeed.item(0) &&
      items.last == StubFeed.item(StubFeed.Total - 1))
    // two injected failures → two sleeps; the 429 honored its
    // Retry-After: 0, the 500 backed off 2^attempt (attempt restarts
    // per page-fetch success, so the 500 after the recovered 429 saw
    // attempt ∈ {0,1} → 1-2 s)
    assert(sleeps.size == 2)
    assert(sleeps.contains(0L) && sleeps.exists(_ >= 1000L))
  }

  test("parsePage: named items field wins, content falls back, neither = empty page") {
    val named = Http.parsePage(
      """{"tasks":[{"a":1}],"content":[{"b":2}]}""", "tasks")
    assert(named.items == Seq("""{"a":1}""") && !named.hasNext)
    val fallback = Http.parsePage("""{"content":[{"b":2}],"paging":{"next":true}}""",
      "tasks")
    assert(fallback.items == Seq("""{"b":2}""") && fallback.hasNext)
    assert(Http.parsePage("""{"note":"no arrays here"}""").items.isEmpty)
  }

  test("DSv2 partitioned read through the live transport, limit pushed") {
    StubFeed.synchronized {
      StubFeed.flaky429Left = 2; StubFeed.requests = 0
    }
    val df = spark.read.format("graft-rest")
      .option("transport", classOf[StubFeedTransport].getName)
      .option("pageSize", 50).option("pages", 5)
      .option("pagesPerPartition", 2)
      .load()
      .select(from_json(col("value"), StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))).as("r"))
      .select("r.*")
    assert(df.count() == StubFeed.Total)
    assert(df.agg(sum("id")).head().getLong(0) ==
      StubFeed.Total * (StubFeed.Total - 1) / 2)
    // a pushed limit plans only the straddling page range: 60 rows =
    // pages 0-1 → one 2-page partition, so ≤ a handful of requests
    StubFeed.synchronized { StubFeed.requests = 0 }
    val limited = spark.read.format("graft-rest")
      .option("transport", classOf[StubFeedTransport].getName)
      .option("pageSize", 50).option("pages", 5)
      .load().limit(60)
    assert(limited.count() == 60)
    assert(StubFeed.requests <= 2)
  }

  test("counted transport self-plans pages from the envelope total, no pages option") {
    val df = spark.read.format("graft-rest")
      .option("transport", classOf[StubCountedTransport].getName)
      .option("pageSize", 100)
      .load()
    assert(df.count() == StubFeed.Total)
    // a wrong total field fails planning loudly, not with zero pages
    val e = intercept[Exception] {
      spark.read.format("graft-rest")
        .option("transport", classOf[BadTotalTransport].getName)
        .option("pageSize", 100).load().count()
    }
    assert(e.getMessage.contains("missing or non-numeric") ||
      Option(e.getCause).exists(_.getMessage.contains("missing or non-numeric")))
  }

  test("sharePointSiteUsers through bodyFetcher: envelope parse, Accept decoration") {
    val out = Rest.sharePointSiteUsers(spark,
      Http.bodyFetcher(s"http://127.0.0.1:${StubFeed.port}/siteusers"))
    assert(StubFeed.lastAccept == "application/json;odata=verbose")
    assert(out.columns.toSeq == Seq("Id", "Title", "Email", "LoginName"))
    val rows = out.orderBy("Id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getString(1) == "Ada" && rows(1).getString(3) == "dom\\bob")
  }

  test("get surfaces non-2xx as HttpError and connect failure as retryable 503") {
    val e = intercept[Rest.HttpError](
      Http.get(s"http://127.0.0.1:${StubFeed.port}/nope"))
    assert(e.status == 404)
    // a port nothing listens on → IOException → the reference's
    // retryable transport-failure class
    val dead = intercept[Rest.HttpError](Http.get("http://127.0.0.1:1/feed"))
    assert(dead.status == 503)
  }
}
