package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side page fetcher for the partitioned REST source. The
  * reader instantiates the implementation BY CLASS NAME on each
  * executor (`Class.forName`, no-arg constructor), so nothing about
  * the transport needs to be serializable and a real cluster build
  * ships it in the application jar like any UDF. Items are JSON
  * object strings — parsing stays in Catalyst (`from_json`), codegen'd
  * and schema-checked, instead of bespoke executor-side JSON handling.
  */
trait RestTransport {
  def fetch(offset: Long, limit: Int): Rest.Page[String]
}

/** Optional planning capability: a transport that can report its total
  * page count (APIs that return `total` in the envelope, or a HEAD
  * count endpoint) lets the driver plan partitions without a `pages`
  * option. Probed driver-side at each scan planning — DSv2 plans per
  * ACTION, so two actions on the same DataFrame may see a feed that
  * grew in between (and pay one probe call each); pass the `pages`
  * option instead to pin the range and skip the probes.
  */
trait KnownPageCount { self: RestTransport =>
  def pageCount(pageSize: Int): Long
}

/** DataSource V2 partitioned REST reader — the scale path for S5
  * (reference: extractors/fetch_yougile_programming.py:128-158) that
  * the driver-side `Rest.paginate` seam deliberately is not. The
  * driver plans one `InputPartition` per page RANGE; executors fetch
  * their ranges in parallel through the same limit/offset + retry
  * protocol (`Rest.withRetry`, Retry-After on 429, exponential
  * backoff). A 10 M-row feed at page size 1 000 becomes 10 000 pages
  * spread across the cluster instead of a single-threaded driver loop.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-rest")
  *     .option("transport", classOf[MyTransport].getName)
  *     .option("pageSize", 1000)
  *     .option("pages", 10000)            // or transport: KnownPageCount
  *     .option("pagesPerPartition", 8)
  *     .load()                            // value: STRING (one JSON item)
  *     .select(from_json($"value", itemSchema).as("r")).select("r.*")
  * }}}
  *
  * Semantics mirror the driver-side protocol: a SHORT page ends that
  * partition's range early (feeds shrink between planning and read),
  * and `limit(n)` is pushed into planning — pages past the limit are
  * never fetched, and the page straddling it is row-capped.
  */
class RestDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestDataSource.ValueSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RestTable(schema, properties)
}

object RestDataSource {
  /** The one-column contract: each row is one fetched item's JSON. */
  val ValueSchema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = false)))

  private[sources] def instantiate(className: String): RestTransport =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[RestTransport]
}

private[sources] class RestTable(schema: StructType,
    properties: java.util.Map[String, String]) extends Table with SupportsRead {
  require(schema == RestDataSource.ValueSchema,
    s"graft-rest emits `value STRING` (parse with from_json); got $schema")
  override def name(): String =
    s"graft-rest(${properties.getOrDefault("transport", "?")})"
  override def schema(): StructType = RestDataSource.ValueSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(options)
}

private[sources] class RestScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Option[Long] = None
  override def pushLimit(n: Int): Boolean = { limit = Some(n.toLong); true }
  // the cap is exact (partitions are page-aligned and row-capped), so
  // Spark may drop its own Limit — still true is conservative-safe
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = {
    val transportClass = Option(options.get("transport")).getOrElse(
      throw new IllegalArgumentException(
        "graft-rest requires option `transport` (RestTransport class name)"))
    val pageSize = options.getInt("pageSize", 1000)
    require(pageSize > 0, "pageSize must be positive")
    val maxRetries = options.getInt("maxRetries", 5)
    val pagesPerPartition = options.getLong("pagesPerPartition", 1L)
    require(pagesPerPartition > 0, "pagesPerPartition must be positive")
    // page count: explicit option wins; else probe a KnownPageCount
    // transport ONCE on the driver — planning needs a bounded range
    val declaredPages = Option(options.get("pages")).map(_.toLong).orElse {
      RestDataSource.instantiate(transportClass) match {
        case k: KnownPageCount => Some(k.pageCount(pageSize))
        case _ => None
      }
    }.getOrElse(throw new IllegalArgumentException(
      "graft-rest needs option `pages`, or a transport with KnownPageCount"))
    val plannedPages = limit match {
      case Some(n) => math.min(declaredPages, (n + pageSize - 1) / pageSize)
      case None => declaredPages
    }
    new RestScan(transportClass, pageSize, plannedPages, pagesPerPartition,
      maxRetries, limit)
  }
}

private[sources] class RestScan(transportClass: String, pageSize: Int,
    pages: Long, pagesPerPartition: Long, maxRetries: Int,
    limit: Option[Long]) extends Scan with Batch {
  override def readSchema(): StructType = RestDataSource.ValueSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rest pages=$pages pageSize=$pageSize limit=${limit.getOrElse(-1L)}"

  override def planInputPartitions(): Array[InputPartition] =
    (0L until pages by pagesPerPartition).map { start =>
      val end = math.min(start + pagesPerPartition, pages)
      // row cap relative to this partition's first row keeps the
      // GLOBAL result ≤ limit: partitions are page-aligned, so rows
      // before this partition number exactly start*pageSize
      val rowCap = limit.map(n => math.max(0L, n - start * pageSize))
      RestInputPartition(start, end, pageSize, transportClass, maxRetries,
        rowCap): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

private[sources] case class RestInputPartition(startPage: Long,
    endPageExclusive: Long, pageSize: Int, transportClass: String,
    maxRetries: Int, rowCap: Option[Long]) extends InputPartition

private[sources] class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(partition.asInstanceOf[RestInputPartition])
}

/** Fetches the partition's page range lazily: one in-flight page of
  * items at a time, each fetch wrapped in the reference retry policy.
  * A short page ends the range (the feed is exhausted); `rowCap`
  * enforces a pushed-down limit exactly.
  */
private[sources] class RestPartitionReader(p: RestInputPartition)
    extends PartitionReader[InternalRow] {
  private val transport = RestDataSource.instantiate(p.transportClass)
  private val policy = Rest.RetryPolicy(maxRetries = p.maxRetries)
  private var page = p.startPage
  private var exhausted = false
  private var emitted = 0L
  private var items: Iterator[String] = Iterator.empty
  private var current: String = _

  private def capped: Boolean = p.rowCap.exists(emitted >= _)

  @annotation.tailrec
  private def advance(): Boolean =
    if (capped) false
    else if (items.hasNext) { current = items.next(); emitted += 1; true }
    else if (exhausted || page >= p.endPageExclusive) false
    else {
      val fetched = Rest.withRetry(policy)(() =>
        transport.fetch(page * p.pageSize, p.pageSize))
      // mirror Rest.paginate exactly: an EMPTY page always ends the
      // range (even with a stale hasNext hint), a short page ends it
      // unless the server hints otherwise
      if (fetched.items.isEmpty ||
          (fetched.items.size < p.pageSize && !fetched.hasNext)) exhausted = true
      page += 1
      items = fetched.items.iterator
      advance()
    }

  override def next(): Boolean = advance()
  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(current)))
  override def close(): Unit = ()
}
