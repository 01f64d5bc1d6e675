package graft.sources.rest

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for cursor-paged REST-style services — the Spark-native
  * re-expression of the reference's Notion scan (SURVEY S3/S4):
  *
  *  - the reference pages sequentially with has_more/next_cursor, 100 rows
  *    per page (notion_db.py:39-55); here each page is an InputPartition so
  *    pages are fetched in parallel across executors;
  *  - the reference ships a checkbox predicate server-side in the query
  *    payload (notion_db.py:86-91); here `SupportsPushDownFilters` consumes
  *    `is_target = true` and hands it to the service, exactly the
  *    source-side-filter contract Catalyst expects.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.rest.PagedRestProvider")
  *   .option("rows", "300").option("pageSize", "100")
  *   .load()
  *   .where(col("is_target") === true)   // pushed to the service
  * }}}
  *
  * The service is instantiated reflectively (options ctor) on executors, so
  * the source works beyond local mode; [[SyntheticNotionService]] is the
  * deterministic offline default (zero-egress environment).
  */
class PagedRestProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRestTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedRestTable(properties.asScala.toMap)
}

object PagedRestTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("is_target", BooleanType, nullable = false)))
}

class PagedRestTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_paged_rest"
  override def schema(): StructType = PagedRestTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(props ++ options.asScala)
}

class PagedRestScanBuilder(opts: Map[String, String]) extends ScanBuilder
    with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** Accept exactly the reference's server-side predicate shape:
    * `is_target = true` (checkbox equals, notion_db.py:88-90). Everything
    * else stays in Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("is_target", true) => true
      case _ => false
    }
    pushed = supported
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = PagedRestScan(
    rows = opts.getOrElse("rows", "300").toInt,
    pageSize = opts.getOrElse("pagesize", opts.getOrElse("pageSize", "100")).toInt,
    onlyTarget = pushed.nonEmpty,
    serviceClass = opts.getOrElse("service",
      classOf[SyntheticNotionService].getName),
    serviceOpts = opts,
    headers = PagedRestScan.authHeaders(opts),
    retry = RestRetryPolicy(
      maxAttempts = opts.getOrElse("maxretries", opts.getOrElse("maxRetries", "3")).toInt + 1,
      backoffMs = opts.getOrElse("retrybackoffms", opts.getOrElse("retryBackoffMs", "100")).toLong))
}

object PagedRestScan {
  /** Bearer-token header from the `token` option — the reference reads its
    * integration token from the environment and attaches it to every call
    * (notion_db.py:18-26); production injects the secret via conf/env, never
    * a literal in code.
    */
  def authHeaders(opts: Map[String, String]): Map[String, String] =
    opts.get("token").map(t => "Authorization" -> s"Bearer $t").toMap
}

case class PageRange(pageIndex: Int) extends InputPartition

case class PagedRestScan(rows: Int, pageSize: Int, onlyTarget: Boolean,
    serviceClass: String, serviceOpts: Map[String, String],
    headers: Map[String, String] = Map.empty,
    retry: RestRetryPolicy = RestRetryPolicy())
    extends Scan with Batch {

  override def readSchema(): StructType = PagedRestTable.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedRestScan rows=$rows pageSize=$pageSize " +
      s"PushedServiceFilter=${if (onlyTarget) "[is_target = true]" else "[]"}"

  /** The default case-class toString would print `serviceOpts` and
    * `headers` verbatim — and both carry the bearer token, which plan
    * descriptions, task-failure exceptions, and debug logs would then leak
    * in plaintext. Never render the credential.
    */
  override def toString: String = description()

  override def planInputPartitions(): Array[InputPartition] = {
    // one cursor range per page — the parallel analogue of the reference's
    // sequential has_more loop
    val service = PagedService.instantiate(serviceClass, serviceOpts)
    val total = RestRetry.run(retry)(service.total(onlyTarget, headers))
    val pages = math.max(1, (total + pageSize - 1) / pageSize)
    (0 until pages).map(PageRange(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(pageSize, onlyTarget, serviceClass, serviceOpts,
      headers, retry)
}

class PagedReaderFactory(pageSize: Int, onlyTarget: Boolean,
    serviceClass: String, serviceOpts: Map[String, String],
    headers: Map[String, String], retry: RestRetryPolicy)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[PageRange].pageIndex
    new PartitionReader[InternalRow] {
      private val service = PagedService.instantiate(serviceClass, serviceOpts)
      // retry wraps each PAGE fetch: a transient 429/5xx costs one page's
      // backoff, not the whole scan; Spark task retry stays the outer net
      private val it = RestRetry.run(retry)(service.fetch(
        RestRequest(page * pageSize, pageSize, onlyTarget, headers))).iterator
      private var current: (Long, String, Boolean) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        current._1, UTF8String.fromString(current._2), current._3))
      override def close(): Unit = ()
    }
  }
}

/** One HTTP-shaped page request: cursor window, the pushed predicate, and
  * transport headers (bearer auth).
  */
final case class RestRequest(offset: Int, limit: Int, onlyTarget: Boolean,
    headers: Map[String, String]) {
  // header VALUES are credentials (Authorization: Bearer <token>); task
  // failures stringify the request, so only header names may render
  override def toString: String =
    s"RestRequest($offset, $limit, $onlyTarget, " +
      s"headers=[${headers.keys.mkString(", ")}])"
}

/** HTTP-status failure a service raises for non-2xx responses. `retryAfterMs`
  * mirrors Retry-After: honored by [[RestRetry]] when >= 0.
  */
class RestStatusException(val status: Int, val retryAfterMs: Long = -1L)
    extends RuntimeException(
      s"paged REST service returned HTTP $status" +
        (if (status == 401 || status == 403)
          " — credentials missing/invalid (set the `token` option; the" +
            " service expects `Authorization: Bearer <token>`)"
        else ""))

/** Bounded exponential backoff for transient HTTP statuses. 401/403 never
  * retry — a bad credential does not heal, fail loudly instead of hammering
  * the service (`maxAttempts` = retries + 1).
  */
final case class RestRetryPolicy(maxAttempts: Int = 4, backoffMs: Long = 100L,
    maxBackoffMs: Long = 10000L) {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
  def retryable(status: Int): Boolean =
    status == 408 || status == 429 || (status >= 500 && status <= 504)
}

object RestRetry {
  /** Run `f`, retrying [[RestStatusException]]s the policy calls transient
    * with exponential backoff (Retry-After wins when the service sends it).
    * `sleep` is injectable for tests.
    */
  def run[A](policy: RestRetryPolicy, sleep: Long => Unit = Thread.sleep)(f: => A): A = {
    var attempt = 1
    var backoff = policy.backoffMs
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(f)
      catch {
        case e: RestStatusException
            if policy.retryable(e.status) && attempt < policy.maxAttempts =>
          sleep(math.min(if (e.retryAfterMs >= 0) e.retryAfterMs else backoff,
            policy.maxBackoffMs))
          backoff = math.min(backoff * 2, policy.maxBackoffMs)
          attempt += 1
      }
    }
    out.get
  }
}

/** Paged-service contract: offset/limit fetch plus a server-side boolean
  * predicate, mirroring the Notion database query API shape the reference
  * consumes (filtered query + cursor pagination). The [[RestRequest]]
  * overloads carry transport headers (bearer auth) for services that
  * enforce them; the defaults delegate so header-oblivious services stay
  * source-compatible.
  */
trait PagedService extends Serializable {
  def total(onlyTarget: Boolean): Int
  def fetch(offset: Int, limit: Int, onlyTarget: Boolean): Seq[(Long, String, Boolean)]
  def total(onlyTarget: Boolean, headers: Map[String, String]): Int =
    total(onlyTarget)
  def fetch(req: RestRequest): Seq[(Long, String, Boolean)] =
    fetch(req.offset, req.limit, req.onlyTarget)
}

object PagedService {
  def instantiate(className: String, opts: Map[String, String]): PagedService =
    Class.forName(className)
      .getDeclaredConstructor(classOf[Map[String, String]])
      .newInstance(opts)
      .asInstanceOf[PagedService]
}

/** Deterministic synthetic service: `rows` pages of (id, "page-<id>",
  * is_target = id % 3 == 0). Stands in for the remote DB in this zero-egress
  * environment; swap via the `service` option.
  */
class SyntheticNotionService(opts: Map[String, String]) extends PagedService {
  private val rows = opts.getOrElse("rows", "300").toInt
  private def all: Seq[(Long, String, Boolean)] =
    (0 until rows).map(i => (i.toLong, s"page-$i", i % 3 == 0))
  override def total(onlyTarget: Boolean): Int =
    if (onlyTarget) all.count(_._3) else rows
  override def fetch(offset: Int, limit: Int, onlyTarget: Boolean): Seq[(Long, String, Boolean)] = {
    val base = if (onlyTarget) all.filter(_._3) else all
    base.slice(offset, offset + limit)
  }
}
