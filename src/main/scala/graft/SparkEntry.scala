package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{array_cosine_distance, array_cosine_similarity, array_inner_product, array_distance, array_l2_norm, doc_prefix, markdown_strip, query_prefix}
import graft.search.{HashingEmbedder, VectorSearchClient}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB-1.0 oracle in
  * [[oracleSql]] (or is deliberately rows-only checked). Column names and
  * types are aligned on both sides; all orderings carry a total tie-break;
  * doubles are emitted raw (the driver's compare normalizes floats).
  * Timestamps are never emitted directly — epoch seconds (BIGINT) or DATE —
  * because Spark writes parquet timestamps as instant-adjusted while the
  * DuckDB oracle computes naive timestamps.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table carries parquet TIMESTAMP(NANOS), which Spark 4 refuses
    * to map to TimestampType; read nanos as long and rebuild a microsecond
    * timestamp (integer division — the values exceed double precision).
    * DuckDB applies the same ns→µs truncation, so oracles agree.
    *
    * The converted frame is materialized ONCE per source dir to a local
    * parquet spool and re-read from there: the 8+ events_* queries would
    * otherwise each re-read and re-convert the nanos column (measured ~0.5 s
    * per query at sf0.1). A parquet spool, unlike `.persist`, survives
    * `spark.catalog.clearCache()` (which Bench issues between queries to
    * bound cache growth) and gives every consumer a normal multi-file scan
    * with pushdown instead of a single-row-group file.
    */
  private val eventsSpool = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bucketed orders+lineitem written ONCE per source dir (catalog tables —
    * bucket metadata needs `saveAsTable`): the pay-at-ingest layout that
    * makes every later orderkey join exchange-free. See
    * [[graft.sources.Bucketing]].
    */
  private val bucketSpool =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def bucketedOrdersLineitem(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val names = bucketSpool.computeIfAbsent(dir, d => {
      val sfx = java.lang.Long.toHexString(d.hashCode.toLong & 0xffffffffL)
      val ot = s"graft_bkt_orders_$sfx"
      val lt = s"graft_bkt_lineitem_$sfx"
      graft.sources.Bucketing.writeBucketed(t(s, d, "orders"), ot, "o_orderkey", 8)
      graft.sources.Bucketing.writeBucketed(t(s, d, "lineitem"), lt, "l_orderkey", 8)
      (ot, lt)
    })
    (s.table(names._1), s.table(names._2))
  }

  private def events(s: SparkSession, dir: String): DataFrame = {
    val path = eventsSpool.computeIfAbsent(dir, d => {
      // The generator has shipped `ts` two ways across rounds: parquet
      // TIMESTAMP(NANOS) (which Spark 4 only reads via the nanosAsLong
      // legacy conf, as a LongType of epoch-nanos) and plain timestamp[us]
      // (read as TIMESTAMP_NTZ). Probe the on-disk schema under nanosAsLong
      // — under that conf BOTH variants resolve (nanos→LongType, µs→NTZ) —
      // and branch, so a future generator flip is absorbed silently.
      //
      // nanosAsLong is needed only while probing/spooling — set, probe,
      // restore, so a query fn doesn't permanently mutate the session conf
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        val raw = t(s, d, "events")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // nanos case: rebuild a µs timestamp (integer division — the
            // values exceed double precision; DuckDB applies the same ns→µs
            // truncation, so oracles agree) and spool ONCE per source dir:
            // the 14 events_* queries would otherwise each re-read and
            // re-convert the nanos column (~0.5 s per query at sf0.1).
            // Single write, no repartition: the spool is small relative to
            // its consumers' shuffles and readers re-split it by scan bins.
            // Nothing downstream depends on file row order — value sums use
            // exact DECIMAL partials
            val tmp = graft.util.TempDirs.create("graft_events_spool")
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
              .write.mode("overwrite").parquet(tmp)
            tmp
          case _ =>
            // µs case: no conversion needed — scan the source directly
            // (keeps the native multi-file scan + pushdown; no spool cost).
            // An NTZ/instant cast is applied uniformly at read-time below.
            s"$d/events.parquet"
        }
      } finally {
        prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      }
    })
    val df = s.read.parquet(path)
    df.schema("ts").dataType match {
      // TIMESTAMP_NTZ → instant under the UTC session TZ: value-preserving,
      // and downstream code (window(), unix_timestamp, ts arithmetic vs the
      // DuckDB oracle's naive read) is written against TimestampType
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Events reader shared with the north-star query pack. */
  private[graft] def eventsTable(s: SparkSession, dir: String): DataFrame =
    events(s, dir)

  /** Vector-search top-k: the reference's core query shape
    * (model/search/vector.py:173-188) — distance scan, top-k, back-join,
    * rank. The query vector is the corpus embedding with vec_id 0, so the
    * oracle can reproduce it without a model in the loop.
    */
  private def searchTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings").withColumnRenamed("vec_id", "doc_id")
    val qvec = emb.where(col("doc_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val client = VectorSearchClient.fromEmbedded(
      docs.select("doc_id", "text"), emb, "doc_id", HashingEmbedder(qvec.length))
    client.searchByVector(qvec, k).select("rank", "doc_id", "text", "score")
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    searchTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * north-star LLM-pipeline operators (graft.queries.NorthStarQueries).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ graft.queries.NorthStarQueries.queries ++
      graft.queries.RelationalQueries.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: vector search (T1+J1+W1/W2+P2-P4+F1) ----
    "search_topk" -> ((s, dir) => searchTopK(s, dir)),

    // S8 + F1-via-SQL: the reference's literal query shape (ORDER BY
    // distance LIMIT n over a registered index view, vector.py:173-180)
    // through spark.sql with the injected array_cosine_distance.
    "search_topk_sql" -> { (s, dir) =>
      graft.functions.registerAll(s)
      t(s, dir, "embeddings").createOrReplaceTempView("ruri_vector_index")
      s.sql(
        """WITH q AS (SELECT embedding FROM ruri_vector_index WHERE vec_id = 0)
          |SELECT vec_id AS doc_id,
          |       array_cosine_distance(embedding, (SELECT embedding FROM q)) AS distance
          |FROM ruri_vector_index
          |ORDER BY distance ASC NULLS LAST, doc_id ASC
          |LIMIT 10""".stripMargin)
    },

    // batched top-k: ONE index scan for 5 queries via the bounded-heap
    // aggregate (TopKByScore) — the offline-batch scale path
    "search_topk_batched" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings").withColumnRenamed("vec_id", "doc_id")
      val docs = t(s, dir, "documents").select("doc_id")
      val qvecs = emb.where(col("doc_id") < 5)
        .select(col("doc_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1).toSeq
      val client = VectorSearchClient.fromEmbedded(
        docs, emb, "doc_id", HashingEmbedder(qvecs.head._2.length))
      client.searchByVectorsBatched(qvecs, 10)
        .select("query_id", "rank", "doc_id", "score")
    },

    // F1 siblings standalone over the embeddings table (fixed literal-free
    // oracle: query vector = embedding of vec_id 0).
    "vector_fns" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val qvec = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble)
      val q = typedLit(qvec)
      emb.where(col("vec_id") < 20)
        .select(
          col("vec_id"),
          array_cosine_distance(col("embedding"), q).as("cos_dist"),
          array_cosine_similarity(col("embedding"), q).as("cos_sim"),
          array_inner_product(col("embedding"), q).as("dot"),
          array_distance(col("embedding"), q).as("l2"),
          array_l2_norm(col("embedding")).as("norm"))
        .transform(graft.queries.sortedSingle(_, col("vec_id")))
    },

    // ---- aggregations (north star; TPC-H Q1 shape) ----
    "q1_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .transform(graft.queries.sortedSingle(_, col("l_returnflag"), col("l_linestatus")))
    },

    // ---- joins: fact-dim star join, dims broadcast. (A/B-measured: fanning
    // the fact side out to 32 partitions first LOSES here — the repartition's
    // map side serializes on the same one-partition scan it tries to fix,
    // 0.97 s -> 1.25 s. The codegen'd single-thread probe is the cheaper
    // local shape; on a real multi-split layout the probes parallelize for
    // free.) ----
    "join_revenue" -> { (s, dir) =>
      val lineitem = t(s, dir, "lineitem")
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .transform(graft.queries.sortedSingle(_, col("n_name")))
    },

    // ---- co-located fact-fact join on bucketed tables: both sides are
    // written ONCE per source dir bucketed+sorted by the join key
    // (graft.sources.Bucketing), so the merge join needs ZERO Exchange —
    // the ingest-time layout that removes the dominant network cost of a
    // recurring 100 TB fact-fact join. The merge hint keeps the plan on
    // the co-located SMJ path even at test scale (where AQE would
    // otherwise broadcast); BucketingSpec asserts the no-Exchange plan. ----
    "bucketed_join_revenue" -> { (s, dir) =>
      val (o, l) = bucketedOrdersLineitem(s, dir)
      // revenue via exact DECIMAL partials (the lineitem_moments recipe):
      // the merge join's accumulation order is not pinned, so a double sum
      // drifts by last-ULP run-to-run; decimal partials are order-free and
      // the 2-dp money columns are recovered exactly by both engines
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0).cast("decimal(3,2)") - col("l_discount").cast("decimal(18,2)"))
      l.hint("merge")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .transform(graft.queries.sortedSingle(_, col("o_orderpriority")))
    },

    // ---- top-k by sort+limit (TakeOrderedAndProject) ----
    "topk_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // ---- window functions: per-key ranking ----
    "window_top_orders" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .transform(graft.queries.sortedSingle(_, col("o_custkey"), col("rn")))
    },

    // ---- set ops: union-all of page batches (U1) ----
    "union_langs" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      docs.where(col("lang") === "en").select("doc_id", "lang")
        .unionAll(docs.where(col("lang") === "fr").select("doc_id", "lang"))
        .transform(graft.queries.sortedSingle(_, col("doc_id")))
    },

    // ---- string ops: markdown strip (F6) + Ruri prefixes (F4/F5) ----
    "markdown_strip_docs" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), markdown_strip(col("text")).as("clean"))
        .transform(graft.queries.sortedSingle(_, col("doc_id")))
    },
    "prefix_docs" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          doc_prefix(col("text")).as("doc_prefixed"),
          query_prefix(col("text")).as("query_prefixed"))
        .transform(graft.queries.sortedSingle(_, col("doc_id")))
    },

    // ---- exact dedup (north star): keep first doc per identical text ----
    "dedup_exact" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "text", "dup_count")
        .transform(graft.queries.sortedSingle(_, col("doc_id")))
    },

    // ---- events: tumbling-window rollup (hour buckets as epoch bigint).
    // value is a 2-dp money column: DECIMAL partials make the sums exact and
    // accumulation-order-free (a double sum is ULP-sensitive to scan split
    // order); avg derives from the exact sum in one double division both
    // engines replay identically. ----
    "events_hourly" -> { (s, dir) =>
      events(s, dir)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .withColumn("avg_value", col("sum_value") / col("n_events"))
        .transform(graft.queries.sortedSingle(_, col("hour_epoch"), col("event_type")))
    },

    // ---- events: gap-based sessionization (30-min inactivity) ----
    "events_sessions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts").cast("double") - col("prev_ts").cast("double") > 1800.0, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum("is_new").as("n_sessions"), count(lit(1)).as("n_events"))
        .transform(graft.queries.sortedSingle(_, col("user_id")))
    },

    // ---- ingestion: CSV sink+scan roundtrip (S1/S2), schema'd both ways.
    // NO multiLine on the read: multiLine makes every CSV file unsplittable
    // — one task per file, a genuine scale killer. The newline-free
    // invariant the splittable read depends on is ENFORCED at write time
    // (strip CR/LF), not assumed of the generator; documents.text is
    // newline-free today so this is the identity, and a future generator
    // change degrades to a lossy-but-correct roundtrip instead of rows torn
    // mid-record. Reads of corpora that keep embedded newlines go through
    // CorpusIO.readCsv, which documents the multiLine trade-off. ----
    "csv_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("text", translate(col("text"), "\r\n", "  "))
      val tmp = graft.util.TempDirs.create("graft_csv_rt") + "/docs"
      docs.write.option("header", "true").option("escape", "\"")
        .mode("overwrite").csv(tmp)
      s.read.schema(docs.schema).option("header", "true")
        .option("escape", "\"").csv(tmp)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
        .transform(graft.queries.sortedSingle(_, col("lang")))
    },

    // ---- ingestion: JSONL sink+scan roundtrip — the LLM-corpus
    // interchange format. Always splittable (JSON escapes newlines), so
    // unlike CSV there is no multiLine trade-off and the roundtrip is
    // lossless for ANY text. The md5-prefix fingerprint sum proves
    // byte-exact text fidelity through the roundtrip, not just row counts.
    // The oracle aggregates the parquet directly — same rows iff the
    // roundtrip was the identity. ----
    "jsonl_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tmp = graft.util.TempDirs.create("graft_jsonl_rt") + "/docs"
      graft.sources.CorpusIO.writeJsonl(docs, tmp)
      graft.sources.CorpusIO.readJsonl(s, tmp, docs.schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
            .as("text_fp_sum"))
        .transform(graft.queries.sortedSingle(_, col("lang")))
    },

    // ---- ingestion: ORC sink+scan roundtrip — the Hive/Trino-side
    // columnar interchange format, covered with the same byte-fidelity
    // gate as jsonl_roundtrip (md5-prefix fingerprint sum over text):
    // the oracle aggregates the source parquet, so the hash matches iff
    // the ORC roundtrip was the identity on every row. ----
    "orc_roundtrip" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tmp = graft.util.TempDirs.create("graft_orc_rt") + "/docs"
      graft.sources.CorpusIO.writeOrc(docs, tmp)
      graft.sources.CorpusIO.readOrc(s, tmp, docs.schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
            .as("text_fp_sum"))
        .transform(graft.queries.sortedSingle(_, col("lang")))
    },

    // ---- ingestion: schema-DRIFT scan — two batches written with
    // different schemas (the second adds `lang`), read back with
    // mergeSchema so pre-drift rows surface the new column as NULL
    // instead of being dropped by a single-footer read. The oracle
    // recomputes the same aggregate from the source table, so rows match
    // iff the merged read preserved every batch and nulled the gap. ----
    "schema_drift_scan" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tmp = graft.util.TempDirs.create("graft_drift") + "/corpus"
      docs.where(col("doc_id") < 250).select("doc_id", "text")
        .write.mode("append").parquet(tmp)
      docs.where(col("doc_id") >= 250).select("doc_id", "text", "lang")
        .write.mode("append").parquet(tmp)
      graft.sources.CorpusIO.readParquetMerged(s, tmp)
        .groupBy(coalesce(col("lang"), lit("(pre-drift)")).as("lang"))
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("n_chars"))
        .transform(graft.queries.sortedSingle(_, col("lang")))
    },

    // ---- F7: newline join of rich-text blocks ----
    "blocks_join_docs" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.join_blocks(split(col("text"), " ")).as("joined"))
        .transform(graft.queries.sortedSingle(_, col("doc_id")))
    },

    // ---- DSv2 paged REST scan with source-side predicate (S3/S4).
    // The synthetic service is deterministic (id, "page-<id>", id%3==0),
    // so a table-free DuckDB range() relation oracles it exactly ----
    "paged_rest_scan" -> { (s, _) =>
      s.read.format("graft.sources.rest.PagedRestProvider")
        .option("rows", "300").option("pageSize", "100").load()
        .where(col("is_target") === true)
        .transform(graft.queries.sortedSingle(_, col("id")))
    },

    // ---- events: CUBE over (event_type, user bucket) — all four grouping
    // sets in one pass (Expand + single aggregate). Group keys are
    // non-null in the data, so the cube's NULLs mark subtotal rows
    // unambiguously and coalesce to sentinels both engines share; the
    // value sum uses the exact DECIMAL partial recipe. ----
    "events_cube" -> { (s, dir) =>
      events(s, dir)
        .withColumn("user_bucket", pmod(col("user_id"), lit(5L)))
        .cube(col("event_type"), col("user_bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("user_bucket"), lit(-1L)).as("user_bucket"),
          col("n_events"), col("sum_value"))
        .transform(graft.queries.sortedSingle(_, col("event_type"), col("user_bucket")))
    },

    // ---- events: SLIDING windows via Spark's native window() — the
    // streaming-core primitive under the batch hash gate (1h window,
    // 30min slide => every event lands in exactly 2 windows; starts are
    // epoch-aligned integers, sums use the exact DECIMAL recipe) ----
    "events_sliding" -> { (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .transform(graft.queries.sortedSingle(_, col("win_start"), col("event_type")))
    },

    // ---- events: exact event dedup by natural key ----
    "events_dedup" -> { (s, dir) =>
      events(s, dir)
        .groupBy("user_id", "event_type", "ts")
        .agg(min("event_id").as("event_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_unique"))
        .transform(graft.queries.sortedSingle(_, col("user_id")))
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB 1.0 on
    * the same parquet tables. Omit for non-SQL-expressible ops (driver then
    * records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    baseOracleSql ++ graft.queries.NorthStarQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql

  private def baseOracleSql: Map[String, String] = Map(
    "search_topk" ->
      """WITH dist AS (
        |  SELECT e.vec_id AS doc_id,
        |         1 - array_cosine_similarity(e.embedding::DOUBLE[64],
        |             (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[64]) AS score
        |  FROM embeddings e
        |), top AS (
        |  SELECT doc_id, score FROM dist ORDER BY score ASC NULLS LAST, doc_id LIMIT 10
        |)
        |SELECT CAST(row_number() OVER (ORDER BY t.score ASC NULLS LAST, t.doc_id) AS BIGINT) AS rank,
        |       t.doc_id, d.text, t.score
        |FROM top t JOIN documents d USING (doc_id)
        |ORDER BY rank""".stripMargin,
    "vector_fns" ->
      """WITH q AS (SELECT embedding::DOUBLE[64] AS v FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       1 - array_cosine_similarity(embedding::DOUBLE[64], (SELECT v FROM q)) AS cos_dist,
        |       array_cosine_similarity(embedding::DOUBLE[64], (SELECT v FROM q)) AS cos_sim,
        |       array_inner_product(embedding::DOUBLE[64], (SELECT v FROM q)) AS dot,
        |       array_distance(embedding::DOUBLE[64], (SELECT v FROM q)) AS l2,
        |       sqrt(array_inner_product(embedding::DOUBLE[64], embedding::DOUBLE[64])) AS norm
        |FROM embeddings WHERE vec_id < 20 ORDER BY vec_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       sum(l_extendedprice) AS sum_base_price,
        |       sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |       avg(l_quantity) AS avg_qty,
        |       avg(l_discount) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "join_revenue" ->
      """SELECT n_name,
        |       sum(l_extendedprice * (1.0 - l_discount)) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // same rows regardless of layout: bucketing changes the PLAN, not the
    // answer — which is exactly what the oracle proves
    "bucketed_join_revenue" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |            (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC LIMIT 10""".stripMargin,
    "window_top_orders" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "union_langs" ->
      """SELECT doc_id, lang FROM documents WHERE lang = 'en'
        |UNION ALL
        |SELECT doc_id, lang FROM documents WHERE lang = 'fr'
        |ORDER BY doc_id""".stripMargin,
    "markdown_strip_docs" ->
      """SELECT doc_id,
        |       replace(replace(replace(text, chr(10)||chr(10), chr(10)), '<br/>', chr(10)), '*', '') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "prefix_docs" ->
      """SELECT doc_id,
        |       '文章: ' || text AS doc_prefixed,
        |       'クエリ: ' || text AS query_prefixed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text, count(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "events_hourly" ->
      """SELECT CAST(date_part('epoch', date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin,
    "events_sessions" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CASE WHEN prev_ts IS NULL
        |                OR date_part('epoch', ts) - date_part('epoch', prev_ts) > 1800.0
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, ts,
        |               lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |        FROM events))
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "search_topk_batched" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
        |d AS (
        |  SELECT q.query_id, e.vec_id AS doc_id,
        |         1 - array_cosine_similarity(e.embedding::DOUBLE[64],
        |             q.embedding::DOUBLE[64]) AS score
        |  FROM embeddings e CROSS JOIN q)
        |SELECT query_id, rank, doc_id, score FROM (
        |  SELECT query_id, doc_id, score,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |              ORDER BY score ASC NULLS LAST, doc_id ASC) AS BIGINT) AS rank
        |  FROM d)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "search_topk_sql" ->
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id AS doc_id,
        |       1 - array_cosine_similarity(embedding::DOUBLE[64],
        |           (SELECT embedding FROM q)::DOUBLE[64]) AS distance
        |FROM embeddings
        |ORDER BY distance ASC NULLS LAST, doc_id ASC
        |LIMIT 10""".stripMargin,
    "csv_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // CAST around the sum: DuckDB's sum(BIGINT) returns HUGEINT (int128),
    // which the driver's type-sensitive hash cannot match against Spark's
    // long — every oracle sum over integers must land back in BIGINT
    "jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n,
        |       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS text_fp_sum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // same byte-fidelity gate as jsonl: the roundtrip must be the identity
    "orc_roundtrip" ->
      """SELECT lang, count(*) AS n,
        |       CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS text_fp_sum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // replay: rows with doc_id < 250 were written WITHOUT lang, so the
    // merged scan must surface them as NULL -> '(pre-drift)'
    "schema_drift_scan" ->
      """SELECT CASE WHEN doc_id < 250 THEN '(pre-drift)'
        |            ELSE coalesce(lang, '(pre-drift)') END AS lang,
        |       count(*) AS n,
        |       CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,
    "blocks_join_docs" ->
      """SELECT doc_id,
        |       array_to_string(list_transform(string_split(text, ' '),
        |         x -> CASE WHEN x IS NULL OR x = '' THEN chr(10) ELSE x END), chr(10)) AS joined
        |FROM documents ORDER BY doc_id""".stripMargin,
    "events_dedup" ->
      """SELECT user_id, count(*) AS n_unique FROM (
        |  SELECT user_id, event_type, ts, min(event_id) AS event_id
        |  FROM events GROUP BY user_id, event_type, ts)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // each event's two sliding windows replayed with integer epoch
    // arithmetic (floor-div to the slide grid; both starts always valid
    // since epoch - (k0-1)*slide < 2*slide = window size). floor() before
    // the BIGINT cast: DuckDB's double->int cast ROUNDS half-even, which
    // would push a boundary-adjacent fractional epoch into the next slide
    // bucket, while Spark's window() floors (grid membership only needs
    // floor(t)/floor-div, which commutes with truncation)
    "events_sliding" ->
      """WITH e AS (
        |  SELECT CAST(floor(date_part('epoch', ts)) AS BIGINT) AS t,
        |         event_type, value
        |  FROM events),
        |w AS (
        |  SELECT t, event_type, value,
        |         unnest([(t // 1800) * 1800, (t // 1800) * 1800 - 1800]) AS win_start
        |  FROM e)
        |SELECT win_start, event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "events_cube" ->
      """SELECT coalesce(event_type, '(all)') AS event_type,
        |       coalesce(user_id % 5, -1) AS user_bucket,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY CUBE (event_type, user_id % 5)
        |ORDER BY event_type, user_bucket""".stripMargin,
    // mirrors SyntheticNotionService: 300 rows, is_target = id % 3 == 0,
    // title "page-<id>" — the pushed filter keeps only targets
    "paged_rest_scan" ->
      """SELECT i AS id, 'page-' || i AS title, TRUE AS is_target
        |FROM (SELECT unnest(range(0, 300)) AS i)
        |WHERE i % 3 = 0 ORDER BY id""".stripMargin,
  )
}
