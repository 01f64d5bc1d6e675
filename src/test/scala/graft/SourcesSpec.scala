package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CorpusIO, SyntheticContentFetcher}

/** Ingestion surface: CSV roundtrip (S1/S2), cache-or-fetch (S7), paged
  * DSv2 REST source with pushdown (S3/S4), content enrichment (S5/S6).
  */
class SourcesSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def corpus = Seq(
    ("song one", "line a\nline b"),
    ("song two", "content with \"quotes\" and, commas"),
    ("song three", null)).toDF("title", "content")

  test("CSV roundtrip preserves the corpus including newlines and quotes") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/corpus"
    CorpusIO.writeCsv(corpus, dir)
    val back = CorpusIO.readCsv(spark, dir)
    assert(back.schema == CorpusIO.corpusSchema)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      corpus.collect().map(r => (r.getString(0), r.getString(1))).toSet)
  }

  test("cacheOrFetch fetches once, then serves the cache") {
    val dir = Files.createTempDirectory("graft_cache").toString + "/corpus"
    var fetches = 0
    def fetch = { fetches += 1; corpus }
    val first = CorpusIO.cacheOrFetch(spark, dir)(fetch)
    assert(first.count() == 3 && fetches == 1)
    val second = CorpusIO.cacheOrFetch(spark, dir)(fetch)
    assert(second.count() == 3 && fetches == 1) // cache hit: no refetch
    val third = CorpusIO.cacheOrFetch(spark, dir, refetch = true)(fetch)
    assert(third.count() == 3 && fetches == 2) // forced refetch
  }

  test("paged REST source reads all pages in parallel partitions") {
    val df = spark.read.format("graft.sources.rest.PagedRestProvider")
      .option("rows", "250").option("pageSize", "100").load()
    assert(df.count() == 250)
    assert(df.rdd.getNumPartitions == 3) // 250 rows / 100 per page
    assert(df.agg(min("id"), max("id")).head() == org.apache.spark.sql.Row(0L, 249L))
  }

  test("is_target predicate is pushed to the service, not post-filtered") {
    val df = spark.read.format("graft.sources.rest.PagedRestProvider")
      .option("rows", "250").option("pageSize", "100").load()
      .where(col("is_target") === true)
    assert(df.count() == 84) // ceil(250/3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedServiceFilter=[is_target = true]"), plan)
    // pushdown shrinks the page count: 84 target rows = 1 page of 100
    assert(df.rdd.getNumPartitions == 1)
  }

  test("content enrichment fetches per-partition batches and strips markdown") {
    val docs = Seq((1L, "t1"), (2L, "t2")).toDF("doc_id", "title")
    val out = CorpusIO.enrichWithContent(docs, "doc_id", SyntheticContentFetcher())
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val content = out.head.getAs[String]("content")
    assert(!content.contains("*") && !content.contains("<br/>"))
    assert(content == "page 1\nline one\nline two for 1")
  }

  test("join_blocks emits newline for empty blocks (F7 parity)") {
    val out = Seq(Seq("a", "", "b")).toDF("blocks")
      .select(graft.functions.join_blocks(col("blocks"))).head().getString(0)
    assert(out == "a\n\n\nb")
  }

  test("JSONL roundtrip is lossless for newlines, quotes, unicode, and nulls") {
    val nasty = Seq(
      (1L, "line one\nline two\r\nwindows"),
      (2L, "quotes \" and \\ backslashes and \t tabs"),
      (3L, "日本語テキストと emoji 😀 mixed"),
      (4L, null: String),
      (5L, ""))
      .toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("graft_jsonl_spec").toString + "/docs"
    CorpusIO.writeJsonl(nasty, tmp)
    val back = CorpusIO.readJsonl(spark, tmp, nasty.schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = nasty.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want)
  }

  test("REST source: bearer token reaches the service; missing token is 401, no retry") {
    AuthRetryService.reset("auth1")
    // correct token: full scan succeeds and the Authorization header was
    // asserted by the service on every call
    val ok = spark.read.format("graft.sources.rest.PagedRestProvider")
      .option("rows", "30").option("pageSize", "100")
      .option("service", classOf[AuthRetryService].getName)
      .option("nonce", "auth1").option("expectToken", "s3cret")
      .option("token", "s3cret")
      .load()
    assert(ok.count() == 30)
    // missing token: 401 surfaces immediately with a fix-it message and is
    // NOT retried (a bad credential does not heal)
    AuthRetryService.reset("auth2")
    val e = intercept[Exception] {
      spark.read.format("graft.sources.rest.PagedRestProvider")
        .option("rows", "30").option("pageSize", "100")
        .option("service", classOf[AuthRetryService].getName)
        .option("nonce", "auth2").option("expectToken", "s3cret")
        .load().count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val status = chain(e).collectFirst {
      case r: graft.sources.rest.RestStatusException => r }
    assert(status.exists(_.status == 401), s"expected HTTP 401, got $e")
    assert(status.exists(_.getMessage.contains("token")), "message should name the fix")
    assert(AuthRetryService.attempts("auth2") == 1,
      s"401 must not retry, saw ${AuthRetryService.attempts("auth2")} attempts")
  }

  test("REST source: the bearer token never renders in scan or request toString") {
    import graft.sources.rest.{PagedRestScan, RestRequest}
    val secret = "s3cret-token-do-not-log"
    val scan = PagedRestScan(rows = 30, pageSize = 100, onlyTarget = false,
      serviceClass = "svc", serviceOpts = Map("token" -> secret),
      headers = PagedRestScan.authHeaders(Map("token" -> secret)))
    assert(!scan.toString.contains(secret),
      s"scan toString leaks the credential: $scan")
    assert(!scan.description().contains(secret))
    val req = RestRequest(0, 100, onlyTarget = false,
      headers = Map("Authorization" -> s"Bearer $secret"))
    assert(!req.toString.contains(secret),
      s"request toString leaks the credential: $req")
    // header NAMES may render (diagnosable), values may not
    assert(req.toString.contains("Authorization"))
  }

  test("REST source: 429 backs off and retries to success; exhaustion fails") {
    // two 429s (with Retry-After), then success: scan completes and the
    // attempt count proves the retries (2 rejected + 1 success per the
    // single page; planInputPartitions' total() is not failure-injected)
    AuthRetryService.reset("rl1")
    val ok = spark.read.format("graft.sources.rest.PagedRestProvider")
      .option("rows", "30").option("pageSize", "100")
      .option("service", classOf[AuthRetryService].getName)
      .option("nonce", "rl1").option("expectToken", "s3cret")
      .option("token", "s3cret").option("fail429", "2")
      .option("retryBackoffMs", "1")
      .load()
    assert(ok.count() == 30)
    assert(AuthRetryService.attempts("rl1") == 3,
      s"expected 2 rejected + 1 success, saw ${AuthRetryService.attempts("rl1")}")
    // more 429s than maxRetries: the scan fails with the status preserved
    AuthRetryService.reset("rl2")
    val e = intercept[Exception] {
      spark.read.format("graft.sources.rest.PagedRestProvider")
        .option("rows", "30").option("pageSize", "100")
        .option("service", classOf[AuthRetryService].getName)
        .option("nonce", "rl2").option("expectToken", "s3cret")
        .option("token", "s3cret").option("fail429", "10")
        .option("maxRetries", "2").option("retryBackoffMs", "1")
        .load().count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists {
      case r: graft.sources.rest.RestStatusException => r.status == 429
      case _ => false
    }, s"expected HTTP 429 after exhaustion, got $e")
    assert(AuthRetryService.attempts("rl2") == 3) // maxRetries 2 -> 3 attempts
  }

  test("readParquetMerged: evolving schemas union; missing columns are NULL both ways") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_drift_spec").toString + "/corpus"
    // batch 1 lacks `lang`; batch 2 lacks `score` — drift in BOTH directions
    Seq((1L, "alpha", 0.5)).toDF("doc_id", "text", "score")
      .write.mode("append").parquet(dir)
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    val got = CorpusIO.readParquetMerged(spark, dir)
      .orderBy("doc_id").collect()
    val cols = CorpusIO.readParquetMerged(spark, dir).columns.toSet
    assert(cols == Set("doc_id", "text", "score", "lang"))
    val byId = got.map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("lang")))
    assert(!byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("score")))
    assert(byId(2L).getString(byId(2L).fieldIndex("lang")) == "en")
  }

  test("compactParquet bin-packs a many-file table, preserving rows, no shuffle") {
    val sp = spark
    import sp.implicits._
    val base = Files.createTempDirectory("graft_compact_spec").toString
    val in = s"$base/in"; val out = s"$base/out"
    // 64 tiny files
    (0L until 2000L).toDF("id").repartition(64).write.parquet(in)
    val partsIn = new java.io.File(in).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(partsIn == 64)
    val n = CorpusIO.compactParquet(spark, in, out, targetBytes = 64L * 1024)
    val partsOut = new java.io.File(out).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(partsOut == n && partsOut < partsIn, s"$partsOut of $partsIn")
    // row parity and no shuffle in the rewrite plan
    assert(spark.read.parquet(out).count() == 2000)
    val plan = spark.read.parquet(in).coalesce(n)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // self-overwrite guard: path-spelling differences must not slip past —
    // overwriting the path being read would destroy the input
    intercept[IllegalArgumentException] {
      CorpusIO.compactParquet(spark, in, in)
    }
    intercept[IllegalArgumentException] {
      CorpusIO.compactParquet(spark, in, s"$in/")
    }
  }
}

/** Synthetic auth/rate-limit service for the bearer-token + backoff specs:
  * `total` is public metadata (no auth — so the missing-token failure lands
  * in the page fetch, attempt-countable), `fetch` requires
  * `Authorization: Bearer <expectToken>` and rejects the first `fail429`
  * attempts per nonce with HTTP 429 + Retry-After. Attempt counters are
  * nonce-keyed in the companion (local mode shares one JVM).
  */
class AuthRetryService(opts: Map[String, String])
    extends graft.sources.rest.PagedService {
  import graft.sources.rest.{RestRequest, RestStatusException}

  private val nonce = opts.getOrElse("nonce", "default")
  private val expect = s"Bearer ${opts.getOrElse("expecttoken", opts.getOrElse("expectToken", ""))}"
  private val fail429 = opts.getOrElse("fail429", "0").toInt
  private val inner = new graft.sources.rest.SyntheticNotionService(opts)

  override def total(onlyTarget: Boolean): Int = inner.total(onlyTarget)
  override def fetch(offset: Int, limit: Int, onlyTarget: Boolean): Seq[(Long, String, Boolean)] =
    fetch(RestRequest(offset, limit, onlyTarget, Map.empty))

  override def fetch(req: RestRequest): Seq[(Long, String, Boolean)] = {
    val n = AuthRetryService.counter(nonce).incrementAndGet()
    if (!req.headers.get("Authorization").contains(expect))
      throw new RestStatusException(401)
    if (n <= fail429) throw new RestStatusException(429, retryAfterMs = 1L)
    inner.fetch(req.offset, req.limit, req.onlyTarget)
  }
}

object AuthRetryService {
  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
  def counter(nonce: String): java.util.concurrent.atomic.AtomicInteger =
    counters.computeIfAbsent(nonce, _ => new java.util.concurrent.atomic.AtomicInteger())
  def attempts(nonce: String): Int = counter(nonce).get()
  def reset(nonce: String): Unit = counter(nonce).set(0)
}
