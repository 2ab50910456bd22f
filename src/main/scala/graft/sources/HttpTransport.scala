package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Default `java.net.http.HttpClient` transport behind the REST seams
  * (S5–S7). The protocol layer (`Rest.paginate`/`withRetry`,
  * `RestDataSource`) stays transport-agnostic and fake-testable; this
  * object supplies the live-I/O implementation the reference performs
  * with `requests` (extractors/fetch_yougile_programming.py:128-143,
  * fetch_sharepoint_users.py:21-33):
  *
  *   - `get` — one GET; non-2xx surfaces as `Rest.HttpError` carrying
  *     `Retry-After`, so `Rest.withRetry` drives the reference's
  *     backoff (2^attempt seconds, Retry-After wins on 429);
  *   - `pageFetcher` — the limit/offset JSON-envelope fetcher
  *     (`?limit=&offset=`, items under `content`, `paging.next` hint)
  *     that plugs straight into `Rest.paginate`;
  *   - `bodyFetcher` — the authed single-GET body fetch
  *     `sharePointSiteUsers` takes (auth decoration = the
  *     AuthContext's headers; an NTLM/OAuth client is configured ON
  *     the injected HttpClient, credentials never touch the engine);
  *   - [[HttpRestTransport]] — the executor-side DSv2 twin: subclass
  *     with a no-arg constructor returning your [[Http.Config]], pass
  *     the class name as the `transport` option, and each executor
  *     builds its own client (HttpClient is not serializable and must
  *     never ride a closure).
  *
  * Items are re-serialized as compact JSON object strings — parsing
  * into columns stays in Catalyst (`from_json`), per the
  * RestDataSource contract.
  */
object Http {

  /** Endpoint description a transport closes over. `itemsField` is the
    * reference's `extract_items` primary key — the named field wins,
    * `content` is the fallback (fetch_yougile_programming.py:56-60).
    */
  final case class Config(
      baseUrl: String,
      headers: Map[String, String] = Map.empty,
      itemsField: String = "content",
      connectTimeoutSec: Long = 10,
      requestTimeoutSec: Long = 30)

  /** Shared driver-side client (connection pooling across pages). */
  lazy val defaultClient: HttpClient = newClient(10)

  def newClient(connectTimeoutSec: Long): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(connectTimeoutSec))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  /** One GET. 2xx → body. Any other status → `Rest.HttpError` (with
    * the server's `Retry-After` seconds when parseable), which
    * `Rest.withRetry` retries per policy. Transport-level failures
    * (connect refused, read timeout) surface as a retryable 503: the
    * reference retries `RequestException` with the same 2^attempt
    * backoff it gives HTTP 5xx (fetch_yougile_programming.py:139-143).
    */
  def get(url: String, headers: Map[String, String] = Map.empty,
      client: HttpClient = defaultClient,
      requestTimeoutSec: Long = 30): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(requestTimeoutSec)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp =
      try client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case _: java.io.IOException => throw Rest.HttpError(503)
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
      }
    if (resp.statusCode() / 100 == 2) resp.body()
    else throw Rest.HttpError(resp.statusCode(),
      scala.jdk.OptionConverters.RichOptional(
        resp.headers().firstValue("Retry-After")).toScala
        .flatMap(_.toLongOption))
  }

  /** Parse one envelope page: items under `itemsField`-else-`content`
    * (each as its own compact JSON string), `paging.next` as the
    * has-more hint. A payload with neither array field yields an empty
    * page, which ends pagination — the reference's `or []`.
    */
  def parsePage(body: String, itemsField: String = "content"): Rest.Page[String] = {
    val mapper = new ObjectMapper
    val root = mapper.readTree(body)
    val arr = Option(root.get(itemsField)).filter(_.isArray)
      .orElse(Option(root.get("content")).filter(_.isArray))
    val items = arr.map(a =>
      (0 until a.size).map(i => a.get(i).toString)).getOrElse(Seq.empty)
    val hasNext = Option(root.get("paging"))
      .flatMap(p => Option(p.get("next"))).exists(_.asBoolean(false))
    Rest.Page(items, hasNext)
  }

  /** The `(offset, limit) => Page` function `Rest.paginate` consumes,
    * over a live endpoint: GET `baseUrl{?|&}limit=..&offset=..`.
    */
  def pageFetcher(cfg: Config,
      client: HttpClient = defaultClient): (Long, Int) => Rest.Page[String] = {
    val sep = if (cfg.baseUrl.contains("?")) "&" else "?"
    (offset, limit) => parsePage(
      get(s"${cfg.baseUrl}${sep}limit=$limit&offset=$offset", cfg.headers,
        client, cfg.requestTimeoutSec),
      cfg.itemsField)
  }

  /** The authed body fetch `sharePointSiteUsers` takes: one GET with
    * the AuthContext's headers on `client` (which carries any
    * transport-level auth — an NTLM-capable or OAuth-intercepting
    * client drops in here without touching the parse).
    */
  def bodyFetcher(url: String,
      client: HttpClient = defaultClient): Rest.AuthContext => String =
    auth => get(url, auth.headers, client)
}

/** Executor-side live transport for the partitioned DSv2 source: a
  * concrete subclass carries the endpoint [[Http.Config]] and a no-arg
  * constructor; its class NAME travels in the scan options
  * (`option("transport", classOf[MyFeed].getName)`) and each executor
  * instantiates it locally — no client, socket, or credential ever
  * serializes. Fetch semantics are identical to the driver-side
  * `Http.pageFetcher` (same envelope, same HttpError surface), so the
  * DSv2 reader's retry/short-page handling behaves exactly like
  * `Rest.paginate`.
  */
abstract class HttpRestTransport extends RestTransport {
  def config: Http.Config
  @transient private lazy val client = Http.newClient(config.connectTimeoutSec)
  @transient private lazy val fetcher = Http.pageFetcher(config, client)
  override def fetch(offset: Long, limit: Int): Rest.Page[String] =
    fetcher(offset, limit)
}

/** [[HttpRestTransport]] for endpoints whose envelope reports the
  * feed's total row count (`totalField`, e.g. `"total"` or
  * `"count"`): implements [[KnownPageCount]] by fetching ONE
  * zero-offset page and reading the field, so the DSv2 scan plans its
  * page-range partitions without a `pages` option. The probe runs on
  * the driver once per scan planning (the KnownPageCount contract);
  * a missing or non-numeric field fails planning loudly rather than
  * silently planning zero pages.
  */
abstract class HttpCountedRestTransport extends HttpRestTransport
    with KnownPageCount {
  def totalField: String = "total"
  override def pageCount(pageSize: Int): Long = {
    val sep = if (config.baseUrl.contains("?")) "&" else "?"
    val body = Http.get(s"${config.baseUrl}${sep}limit=1&offset=0",
      config.headers, requestTimeoutSec = config.requestTimeoutSec)
    val node = Option(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body).get(totalField))
      .filter(_.canConvertToLong)
      .getOrElse(throw new IllegalStateException(
        s"envelope field '$totalField' missing or non-numeric — " +
          "pass option `pages` instead"))
    (node.asLong() + pageSize - 1) / pageSize
  }
}
