package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.markdown_strip

/** Corpus ingestion surface (SURVEY §2.1):
  *  - S1/S2: schema'd CSV scan/sink mirroring the reference's corpus cache
  *    (`pd.read_csv` / `to_csv(index=False)`, notion_db.py:209,205)
  *  - S7: cache-or-fetch materialization (`fetch_sakurap_corpus`,
  *    notion_db.py:175-211): if the cache path exists (and no refetch), read
  *    it; otherwise run the fetch, persist write-through, and read back.
  *  - S5/S6: per-row content enrichment (`StringExporter().export()` /
  *    `__load_blocks`, notion_db.py:106-134,159) as batched mapPartitions.
  */
object CorpusIO {

  /** The reference corpus schema: (title, content) rows (notion_db.py:163-168). */
  val corpusSchema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  /** S1 — CSV scan with explicit schema (no inference jobs at scale).
    *
    * `multiLine` defaults to true because the reference corpus (lyric
    * content, notion_db.py:163-168) embeds newlines inside quoted fields —
    * but a multiLine CSV file is UNSPLITTABLE: Spark cannot find record
    * boundaries mid-file, so each file becomes exactly one task. That is
    * acceptable for this corpus-cache path (many small write-through files,
    * bounded by [[writeCsv]]'s output partitioning); for any large
    * newline-free extract pass `multiLine = false` to keep files splittable,
    * and prefer Parquet for anything beyond a cache (SURVEY §5).
    */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType = corpusSchema, multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
      .csv(path)

  /** S2 — CSV sink (header, no index column — pandas parity). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("escape", "\"")
      .mode("overwrite")
      .csv(path)

  /** JSONL corpus sink — the LLM-pipeline interchange format (one JSON
    * object per line). Unlike multiLine CSV, JSONL is ALWAYS splittable —
    * record boundaries are physical newlines and embedded newlines are
    * escaped by JSON itself — so files scan in parallel at any size, and
    * the roundtrip is lossless for arbitrary text.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL corpus scan. Schema is required, not inferred: inference scans
    * the data an extra time and silently widens types on dirty corpora.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType = corpusSchema): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC corpus sink — the other columnar interchange format (Hive/Trino
    * lakehouses). Same posture as parquet: splittable stripes, column
    * projection and predicate pushdown at the reader, so a 100 TB corpus
    * scans with the identical plan shape. Use when the downstream consumer
    * is ORC-native; otherwise prefer parquet (the rest of this engine's
    * at-rest layouts — ANN buckets, PQ codes, postings — are parquet).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC corpus scan. Schema passed explicitly for the same reason as
    * [[readJsonl]] — no inference pass, no silent widening.
    */
  def readOrc(spark: SparkSession, path: String,
      schema: StructType = corpusSchema): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Schema-drift scan: read a parquet corpus whose batches were written
    * with EVOLVING schemas (a long-lived ingest adds columns over time;
    * early files simply lack them). `mergeSchema` unions the per-file
    * footers, so rows from pre-drift files surface the new columns as
    * NULL instead of the default single-footer read silently dropping
    * them (or failing, depending on which file Spark samples). Cost: one
    * footer read per file at planning — fine after [[compactParquet]];
    * on a million-file raw landing zone, compact first.
    */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Small-file compaction — the operational fix for the classic
    * post-ingest layout problem: streaming/incremental writers leave
    * thousands of KB-sized parquet files whose per-file open cost and
    * scheduler overhead dominate every later scan. Rewrites `inPath` to
    * `outPath` as ~`targetBytes`-sized files (count derived from the
    * ACTUAL on-disk bytes, never a row-count guess) and returns that file
    * count. Deliberately writes to a NEW path: an in-place swap can't be
    * atomic on a plain filesystem, so the caller owns the pointer flip —
    * same contract as every table-format OPTIMIZE job.
    *
    * `coalesce` (not `repartition`): compaction must not pay a shuffle —
    * narrow bin-packing of existing partitions is the whole point. Order
    * within files changes; parquet scans never promised one.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val hconf = spark.sparkContext.hadoopConfiguration
    val inP = new org.apache.hadoop.fs.Path(inPath)
    val fs = inP.getFileSystem(hconf)
    // overwrite-while-reading guard: Spark's own self-overwrite detection
    // can be evaded by path-spelling differences (trailing slash, relative
    // vs scheme-qualified), so compare fully-qualified paths ourselves —
    // mode("overwrite") onto the scan's own path would destroy the input
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val qualIn = fs.makeQualified(inP)
    val qualOut = outP.getFileSystem(hconf).makeQualified(outP)
    require(qualIn != qualOut,
      s"compactParquet: outPath must differ from inPath (both resolve to $qualIn)")
    val totalBytes = fs.getContentSummary(inP).getLength
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Training-ready SHARDED export — the last step of a curation pipeline:
    * write the corpus as `nShards` deterministic hash shards (partitioned
    * parquet, `shard=NNN` directories a data loader can range-assign to
    * workers) and return the per-shard MANIFEST the training job checks
    * before reading: (shard, n_rows, id_checksum). Shard assignment is the
    * engine's standard md5 bucket of the id — stable under retry,
    * speculative execution and engine swap, and replayable in SQL, so the
    * manifest itself can sit under the hash gate. The checksum is the
    * BIT_XOR of the ids' 60-bit md5 longs — order-independent (any read
    * order verifies) and overflow-free at any shard size (a wrapping SUM
    * would trip ANSI overflow checking on big shards).
    *
    * Scale shape: one scan, one partitioned write (the writer hash-
    * distributes by the shard column — no pre-repartition needed at
    * `nShards` ≪ tasks), and the manifest is one `nShards`-row aggregate.
    */
  def writeSharded(df: DataFrame, idCol: String, nShards: Int,
      path: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val sharded = df.withColumn("shard",
      graft.ops.Sampling.hashBucket(col(idCol), nShards))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    // The manifest aggregates the FILES JUST WRITTEN, not the logical plan
    // that produced them: re-running the input plan for the manifest pass
    // could disagree with the on-disk shards it claims to verify if the
    // source mutated (or any upstream nondeterminism fired) between the
    // two executions — and the read-back doubles as a write verification.
    // `shard` comes back as a partition directory column (inferred int) —
    // cast to long to keep the manifest schema identical to the write side.
    df.sparkSession.read.parquet(path)
      .select(col("shard").cast("long").as("shard"),
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long").as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("id_checksum"))
  }

  /** S7 — cache-or-fetch: the reference's write-through corpus cache.
    * `fetch` runs only on cache miss (or refetch=true), its result is
    * persisted to `cachePath` and read back so downstream always consumes
    * the materialized copy (same lifecycle as notion_db.py:193-209).
    */
  def cacheOrFetch(spark: SparkSession, cachePath: String,
      refetch: Boolean = false)(fetch: => DataFrame): DataFrame = {
    val path = new Path(cachePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (refetch || !fs.exists(path)) {
      writeCsv(fetch, cachePath)
    }
    readCsv(spark, cachePath)
  }

  /** S5/S6 — per-row content fetch, batched per partition (the reference
    * does a per-row HTTP call, an N+1 pattern; here the fetcher sees one
    * batch per partition so a real impl can pipeline its I/O).
    */
  def enrichWithContent(df: DataFrame, idCol: String,
      fetcher: PageContentFetcher): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val f = fetcher
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(64).flatMap { chunk =>
          chunk.iterator.zip(f.fetchBatch(chunk).iterator)
        }
      }
      .toDF(idCol, "content_raw")
      .withColumn("content", markdown_strip(col("content_raw")))
      .drop("content_raw")
      .join(df, idCol)
  }
}

/** Pluggable page-content fetcher (mirrors the reference's StringExporter /
  * plain-text block loader). Implementations must be Serializable; batches
  * arrive one partition chunk at a time.
  */
trait PageContentFetcher extends Serializable {
  def fetchBatch(ids: Seq[Long]): Seq[String]
}

/** Deterministic offline fetcher for tests: content derived from the id,
  * with the markdown artifacts the strip chain (F6) removes.
  */
final case class SyntheticContentFetcher() extends PageContentFetcher {
  override def fetchBatch(ids: Seq[Long]): Seq[String] =
    ids.map(id => s"*page $id*\n\nline one<br/>line two for $id")
}
