package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.reflect.runtime.universe.TypeTag

/** The reference's REST-extractor protocol (S5-S7;
  * extractors/fetch_yougile_programming.py:127-157) as pure,
  * injectable driver-side logic: limit/offset pagination to
  * exhaustion and a retry policy with exponential backoff that honors
  * `Retry-After` on 429.
  *
  * The HTTP transport is a plain `(offset, limit) => Page` function —
  * external I/O stays outside the engine (and outside this zero-egress
  * harness); tests drive the protocol with fakes. Fetched items enter
  * Spark through `ingest` (createDataFrame), after which everything is
  * distributed. Connector fetch volume is bounded (catalog-sized API
  * exports, 1000 rows/page in the reference), so a driver-side collect
  * then parallelize is the right scale shape — the fact tables that
  * actually grow arrive through file/JDBC scans, not REST.
  */
object Rest {

  /** One fetched page. `hasNext` mirrors the reference's
    * `paging.next` hint: pagination stops on an empty page, or when
    * the hint is false AND the page came back short (both conditions,
    * like the reference — a full page with no hint still advances).
    */
  final case class Page[A](items: Seq[A], hasNext: Boolean = false)

  /** HTTP failure surfaced by a transport. */
  final case class HttpError(status: Int, retryAfterSec: Option[Long] = None)
    extends RuntimeException(s"HTTP $status")

  /** fetch_yougile_programming.py:46-52,128-143 — 5 retries, 2^attempt
    * seconds backoff, retryable statuses, Retry-After wins on 429.
    */
  final case class RetryPolicy(
      maxRetries: Int = 5,
      retryable: Set[Int] = Set(429, 500, 502, 503, 504))

  /** Run `f`, retrying per policy. `sleep` is injectable for tests;
    * delays are whole seconds (2^attempt, or the server's Retry-After
    * on 429).
    */
  @annotation.tailrec
  def withRetry[A](policy: RetryPolicy = RetryPolicy(),
      sleep: Long => Unit = Thread.sleep, attempt: Int = 0)(f: () => A): A = {
    val r = try Right(f()) catch {
      case e: HttpError if policy.retryable(e.status) && attempt < policy.maxRetries =>
        Left(e)
    }
    r match {
      case Right(a) => a
      case Left(e) =>
        val delaySec = e.retryAfterSec.filter(_ => e.status == 429)
          .getOrElse(1L << attempt)
        sleep(delaySec * 1000)
        withRetry(policy, sleep, attempt + 1)(f)
    }
  }

  /** Lazy limit/offset pagination to exhaustion, each page fetch
    * wrapped in the retry policy.
    */
  def paginate[A](pageLimit: Int, fetch: (Long, Int) => Page[A],
      policy: RetryPolicy = RetryPolicy(),
      sleep: Long => Unit = Thread.sleep): Iterator[A] =
    Iterator.unfold(Option(0L)) {
      case None => None
      case Some(offset) =>
        val page = withRetry(policy, sleep)(() => fetch(offset, pageLimit))
        if (page.items.isEmpty) None
        else {
          val done = !page.hasNext && page.items.size < pageLimit
          Some((page.items, if (done) None else Some(offset + pageLimit)))
        }
    }.flatten

  /** OData-style link pagination: follow the server's continuation
    * token (`d.__next` / `odata.nextLink`) to exhaustion — the
    * envelope-driven sibling of limit/offset `paginate`, for APIs
    * where the server, not the client, owns the cursor. `fetch`
    * receives None for the first page, then each continuation token;
    * every page fetch is wrapped in the retry policy. Lazy: pages are
    * fetched as the iterator is consumed (Iterator#++ is non-strict).
    */
  def paginateByLink[A](fetch: Option[String] => (Seq[A], Option[String]),
      policy: RetryPolicy = RetryPolicy(),
      sleep: Long => Unit = Thread.sleep): Iterator[A] = {
    def pages(token: Option[String]): Iterator[Seq[A]] = {
      val (items, next) = withRetry(policy, sleep)(() => fetch(token))
      Iterator.single(items) ++ (next match {
        case Some(t) => pages(Some(t))
        case None => Iterator.empty
      })
    }
    // Iterator#++'s operand is by-name — the empty prefix defers even
    // the FIRST fetch until the iterator is consumed
    (Iterator.empty[Seq[A]] ++ pages(None)).flatten
  }

  /** The driver→cluster seam: connector output becomes a partitioned
    * DataFrame. From here on, every transform is distributed.
    */
  def ingest[A <: Product: TypeTag](spark: SparkSession, items: Seq[A]): DataFrame = {
    import spark.implicits._
    val df = spark.createDataset(items).toDF()
    df.repartition(spark.sparkContext.defaultParallelism)
  }

  // ---- S6: SharePoint OData-verbose envelope ----------------------------

  /** Auth is a transport concern (the reference's
    * requests_ntlm HttpNtlmAuth, fetch_sharepoint_users.py:21-27):
    * the engine only requires that *something* decorates the request.
    * A transport closes over its AuthContext; the parse below never
    * sees credentials.
    */
  final case class AuthContext(headers: Map[String, String] = Map(
    "Accept" -> "application/json;odata=verbose"))

  /** `data['d']['results']` of an `odata=verbose` payload as an array
    * column (fetch_sharepoint_users.py:29-31). Declared item schema —
    * unknown fields are dropped by from_json, exactly like the
    * reference's column projection after DataFrame(users).
    */
  def odataVerboseResults(payload: org.apache.spark.sql.Column,
      itemSchema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
    org.apache.spark.sql.functions.from_json(payload,
      StructType(Seq(StructField("d", StructType(Seq(
        StructField("results", ArrayType(itemSchema))))))))
      .getField("d").getField("results")
  }

  /** The site-users export end to end (S6): one authed GET (driver-
    * side, catalog-sized — same rationale as `paginate`), envelope
    * parse, the reference's exact 4-column projection
    * (fetch_sharepoint_users.py:33). The fetch seam takes the
    * AuthContext so tests (and a real NTLM transport) plug in behind
    * the same signature.
    */
  def sharePointSiteUsers(spark: SparkSession,
      fetchBody: AuthContext => String,
      auth: AuthContext = AuthContext()): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val itemSchema = StructType(Seq(
      StructField("Id", LongType),
      StructField("Title", StringType),
      StructField("Email", StringType),
      StructField("LoginName", StringType)))
    val body = withRetry()(() => fetchBody(auth))
    import spark.implicits._
    val parsed = Seq(body).toDF("payload")
      .select(odataVerboseResults(col("payload"), itemSchema).as("results"))
    // fail fast on a non-envelope payload (HTML error page, odata=
    // nometadata {"value":[...]}, truncated JSON): from_json turns all
    // of those into null, and exploding null would silently report
    // "zero site users" — the reference's data['d']['results'] raises
    if (parsed.head().isNullAt(0))
      throw new IllegalStateException(
        "sharePointSiteUsers: payload is not an odata=verbose d.results envelope")
    parsed
      .select(explode(col("results")).as("u"))
      .select(col("u.Id").as("Id"), col("u.Title").as("Title"),
        col("u.Email").as("Email"), col("u.LoginName").as("LoginName"))
  }
}
