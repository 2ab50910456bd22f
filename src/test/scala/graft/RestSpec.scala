package graft

import graft.sources.Rest
import graft.sources.Rest.{HttpError, Page, RetryPolicy}
import scala.collection.mutable

/** The REST connector protocol against fake transports — paging
  * boundaries, retry/backoff schedule, Retry-After, and the
  * createDataFrame ingest seam.
  */
class RestSpec extends SparkSpec {

  test("paginate walks offsets and stops on the short no-next page") {
    val calls = mutable.Buffer[Long]()
    val total = 2500
    def fetch(offset: Long, limit: Int): Page[Int] = {
      calls += offset
      val items = (offset.toInt until math.min(offset.toInt + limit, total)).toSeq
      Page(items, hasNext = offset + limit < total)
    }
    val got = Rest.paginate(1000, fetch).toSeq
    assert(got == (0 until 2500))
    assert(calls.toSeq == Seq(0L, 1000L, 2000L)) // no 4th probe
  }

  test("paginate stops on an empty page even when the hint says next") {
    def fetch(offset: Long, limit: Int): Page[Int] =
      if (offset == 0) Page(Seq(1, 2, 3), hasNext = true)
      else Page(Seq.empty, hasNext = true)
    assert(Rest.paginate(3, fetch).toSeq == Seq(1, 2, 3))
  }

  test("a full page without a next hint still advances") {
    def fetch(offset: Long, limit: Int): Page[Int] =
      if (offset == 0) Page(Seq(1, 2), hasNext = false) // full (limit 2)
      else Page(Seq(3), hasNext = false)                // short → stop
    assert(Rest.paginate(2, fetch).toSeq == Seq(1, 2, 3))
  }

  test("withRetry: exponential backoff then success") {
    val sleeps = mutable.Buffer[Long]()
    var n = 0
    val got = Rest.withRetry(sleep = sleeps += _)(() => {
      n += 1
      if (n <= 3) throw HttpError(503) else "ok"
    })
    assert(got == "ok" && n == 4)
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L)) // 2^0, 2^1, 2^2 sec
  }

  test("withRetry: Retry-After drives the 429 delay") {
    val sleeps = mutable.Buffer[Long]()
    var n = 0
    Rest.withRetry(sleep = sleeps += _)(() => {
      n += 1
      if (n == 1) throw HttpError(429, retryAfterSec = Some(7)) else "ok"
    })
    assert(sleeps.toSeq == Seq(7000L))
  }

  test("withRetry: non-retryable status propagates immediately") {
    var n = 0
    val e = intercept[HttpError](Rest.withRetry(sleep = _ => ())(() => {
      n += 1; throw HttpError(404)
    }))
    assert(e.status == 404 && n == 1)
  }

  test("withRetry: budget exhausts after maxRetries") {
    var n = 0
    def boom(): String = { n += 1; throw HttpError(503) }
    intercept[HttpError](
      Rest.withRetry(RetryPolicy(maxRetries = 5), sleep = _ => ())(boom _))
    assert(n == 6) // 1 initial + 5 retries, like the reference
  }

  test("ingest lands connector items as a partitioned DataFrame") {
    val df = Rest.ingest(spark, Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(df.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(df.count() == 3)
  }

  test("S6: OData-verbose envelope parse, 4-column projection, auth on the seam") {
    var seenAccept: Option[String] = None
    val body = """{"d":{"results":[
      {"Id": 7, "Title": "Григорьев Роман", "Email": "r@x.ru",
       "LoginName": "i:0#.w|dom\\r.grigoriev", "IsSiteAdmin": true,
       "PrincipalType": 1},
      {"Id": 9, "Title": "Анна", "Email": null,
       "LoginName": "i:0#.w|dom\\anna", "IsSiteAdmin": false}
    ]}}"""
    val got = Rest.sharePointSiteUsers(spark, auth => {
      seenAccept = auth.headers.get("Accept"); body
    })
    // the transport saw the odata=verbose accept header
    assert(seenAccept.contains("application/json;odata=verbose"))
    // exactly the reference's projection — extra payload fields dropped
    assert(got.columns.toSeq == Seq("Id", "Title", "Email", "LoginName"))
    val rows = got.orderBy("Id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 7L)
    assert(rows(0).getString(1) == "Григорьев Роман")
    assert(rows(1).isNullAt(2)) // null Email survives as null
  }

  test("paginateByLink follows continuation tokens lazily to exhaustion") {
    var fetched = List.empty[Option[String]]
    def fetch(tok: Option[String]): (Seq[Int], Option[String]) = {
      fetched :+= tok
      tok match {
        case None => (Seq(1, 2), Some("t1"))
        case Some("t1") => (Seq(3), Some("t2"))
        case Some("t2") => (Seq(4, 5), None)
        case other => fail(s"unexpected token $other")
      }
    }
    val it = Rest.paginateByLink(fetch, sleep = _ => ())
    assert(fetched.isEmpty) // nothing fetched until consumed
    assert(it.toSeq == Seq(1, 2, 3, 4, 5))
    assert(fetched == List(None, Some("t1"), Some("t2")))
  }

  test("paginateByLink retries a flaky page then continues the chain") {
    var failures = 1
    def fetch(tok: Option[String]): (Seq[Int], Option[String]) = tok match {
      case None => (Seq(1), Some("t"))
      case Some("t") if failures > 0 => failures -= 1; throw HttpError(503)
      case Some("t") => (Seq(2), None)
      case other => fail(s"unexpected token $other")
    }
    assert(Rest.paginateByLink(fetch, sleep = _ => ()).toSeq == Seq(1, 2))
  }

  test("S6: a non-envelope payload fails fast instead of yielding zero users") {
    val e = intercept[IllegalStateException] {
      Rest.sharePointSiteUsers(spark, _ => """<html>502 Bad Gateway</html>""")
    }
    assert(e.getMessage.contains("envelope"))
  }
}
