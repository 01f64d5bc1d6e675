package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{array_cosine_distance, doc_prefix}

/** Spark-native semantic-search engine — the reference's core capability
  * (`BaseSearchClient`, reference: model/search/base.py:7-20, implemented by
  * `RuriDuckDBSearchClient`, model/search/vector.py:81-190), re-expressed as a
  * distributed plan:
  *
  *   corpus --(prefix "文章: ", mapPartitions embed)--> vector index [cached]
  *   query  --(prefix "クエリ: ", embed driver-side)--> literal vector
  *   index  --(cosine distance, TakeOrderedAndProject top-k)--> hits
  *   hits   --(broadcast join corpus, rank window)--> (rank, <corpus cols>, score)
  *
  * Scale design: the vector index keeps ONLY (id, embedding) — the text
  * columns live in the corpus table, so the brute-force scan reads a narrow
  * projection (column pruning; the reference keeps the same split at
  * vector.py:134 vs :87). Top-k uses sort+limit, which Catalyst plans as
  * TakeOrderedAndProject: per-partition bounded heap + k-row driver merge —
  * no global sort, no full shuffle, the exact distributed analogue of
  * DuckDB's Top-N optimization. The k-row result is broadcast for the
  * back-join, so corpus rows never shuffle.
  *
  * Ordering parity: DuckDB's `ORDER BY distance` puts NULLs LAST (verified on
  * the 1.0 oracle); Spark's default asc is NULLS FIRST — every ordering here
  * uses `asc_nulls_last` so null-scored rows (null embeddings) never seize the
  * top ranks. Internal columns are `__graft_`-prefixed so a corpus that
  * already has `score`/`rank` columns (the reference itself writes those onto
  * the corpus frame, vector.py:184-186) cannot collide.
  */
final class VectorSearchClient private (
    val corpus: DataFrame,      // (doc_id, <target/text cols...>)
    val index: DataFrame,       // (doc_id, embedding array<float>)
    val embedder: Embedder,
    idCol: String) extends Serializable {

  import VectorSearchClient._

  /** Top-n hits for one literal query vector (no model in the loop — the
    * oracle-checkable core). Output: (rank [1-based long], <corpus cols>, score).
    */
  def searchByVector(qvec: Array[Double], n: Int = 10): DataFrame =
    searchByVectors(Seq(0L -> qvec), n).drop("query_id")

  /** Batched vector search: one output DataFrame keyed by `query_id` (the
    * reference returns List[DataFrame], one per query — vector.py:140,170-188
    * — batched here by design, SURVEY §7.0).
    */
  def searchByVectors(qvecs: Seq[(Long, Array[Double])], n: Int = 10): DataFrame = {
    require(qvecs.nonEmpty, "search needs at least one query vector")
    // Per-query top-k scans, unioned: each plans as TakeOrderedAndProject
    // (per-partition bounded heap, k-row driver merge). For large query
    // batches prefer one scan + per-query heap aggregation; at the
    // reference's Q (interactive, Q=1) per-query scans are optimal.
    val perQuery = qvecs.map { case (qid, qv) =>
      index
        .select(
          col(idCol),
          array_cosine_distance(col("embedding"), typedLit(qv.toSeq)).as(ScoreCol))
        .orderBy(col(ScoreCol).asc_nulls_last, col(idCol).asc)
        .limit(n)
        .withColumn(QueryIdCol, lit(qid))
    }
    val hits = perQuery.reduce(_ unionAll _)
    // Rank before the back-join: Spark joins do not preserve order (the
    // reference relies on pandas iloc order, vector.py:183-186 — SURVEY §7.3).
    val ranked = hits.withColumn(
      RankCol,
      row_number().over(
        Window.partitionBy(col(QueryIdCol))
          .orderBy(col(ScoreCol).asc_nulls_last, col(idCol).asc)).cast("long"))
    // Order on the internal (collision-proof) columns BEFORE the renaming
    // projection: a corpus that already has rank/score columns would make a
    // post-rename orderBy ambiguous. Projection preserves sort order.
    broadcast(ranked)
      .join(corpus, idCol)
      .orderBy(col(QueryIdCol), col(RankCol))
      .select(
        (col(QueryIdCol).as("query_id") +: col(RankCol).as("rank") +:
          corpus.columns.map(col) :+ col(ScoreCol).as("score")): _*)
  }

  /** Batched search with ONE index scan for the whole query batch: the
    * query-vector table is broadcast into the scan, distances aggregate
    * per query through a bounded-heap aggregate ([[graft.functions.TopKByScore]])
    * with map-side combining — each partition ships at most k rows per
    * query to the shuffle. Use for large offline batches; per-query
    * `TakeOrderedAndProject` scans ([[searchByVectors]]) win at
    * interactive Q. Requires a long id column.
    * Output matches [[searchByVectors]]: (query_id, rank, <corpus cols>, score).
    */
  def searchByVectorsBatched(qvecs: Seq[(Long, Array[Double])], n: Int = 10): DataFrame = {
    require(qvecs.nonEmpty, "search needs at least one query vector")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = qvecs.map { case (qid, v) => (qid, v.toSeq) }
      .toDF(QueryIdCol, "__graft_qvec")
    val hits = index
      .crossJoin(broadcast(qdf))
      .select(col(QueryIdCol),
        struct(
          graft.functions.array_cosine_distance(col("embedding"), col("__graft_qvec"))
            .as("score"),
          col(idCol).cast("long").as("id")).as("__graft_sv"))
      .groupBy(col(QueryIdCol))
      .agg(graft.functions.topk_by_score(col("__graft_sv"), n).as("__graft_hits"))
      .select(col(QueryIdCol), posexplode(col("__graft_hits")))
      .select(col(QueryIdCol), (col("pos") + 1).cast("long").as(RankCol),
        col("col.id").as(idCol), col("col.score").as(ScoreCol))
    broadcast(hits)
      .join(corpus, idCol)
      .orderBy(col(QueryIdCol), col(RankCol))
      .select(
        (col(QueryIdCol).as("query_id") +: col(RankCol).as("rank") +:
          corpus.columns.map(col) :+ col(ScoreCol).as("score")): _*)
  }

  /** Top-n hits for a batch of text queries: embeds driver-side exactly as the
    * reference embeds the query batch in one encode() call (vector.py:164-167),
    * applying the Ruri query prefix.
    */
  def searchTopN(queries: Seq[String], n: Int = 10): DataFrame = {
    require(queries.nonEmpty, "searchTopN needs at least one query")
    val qvecs = embedder.embedBatch(queries.map(q => QueryPrefix + q))
    searchByVectors(
      qvecs.zipWithIndex.map { case (v, i) => i.toLong -> v.map(_.toDouble) }, n)
  }

  /** Single-query convenience matching the demo app's shape
    * (reference: app.py:8-17 — 1-based rank, renamed columns).
    */
  def search(query: String, n: Int = 10): DataFrame =
    searchTopN(Seq(query), n).drop("query_id")

  /** The demo UI's exact projection+rename (reference app.py:12-14):
    * `[rank, title, "rap lyric", distance]`, 1-based rank. `titleCol` /
    * `contentCol` name the corpus columns standing in for title/content.
    */
  def searchDemo(query: String, n: Int = 10, titleCol: String = "title",
      contentCol: String = "content"): DataFrame =
    search(query, n).select(
      col("rank"),
      col(titleCol).as("title"),
      col(contentCol).as("rap lyric"),
      col("score").as("distance"))

  /** S8 — expose the vector index to SQL under the reference's index name
    * (`duckdb.register("ruri_vector_index", vdb)`, vector.py:133-135), so
    * the oracle's literal SQL shape runs via spark.sql + the registered
    * `array_cosine_distance` function.
    */
  def registerIndex(name: String = "ruri_vector_index"): Unit = {
    graft.functions.registerAll(index.sparkSession)
    index.createOrReplaceTempView(name)
  }
}

object VectorSearchClient {
  /** Model-family prefixes — a semantic contract of the Ruri embedder
    * (reference: model/search/vector.py:123,164).
    */
  val DocPrefix = "文章: "
  val QueryPrefix = "クエリ: "

  private val ScoreCol = "__graft_score"
  private val RankCol = "__graft_rank"
  private val QueryIdCol = "__graft_query_id"

  /** Build from a corpus with precomputed embeddings (CI path — offline).
    * E2: the index dimension is validated against the embedder up front —
    * a mismatched index would otherwise fail per-row at query time (the
    * reference introspects dim the same way, vector.py:129,172).
    */
  def fromEmbedded(corpus: DataFrame, embedded: DataFrame, idCol: String,
      embedder: Embedder, validateDim: Boolean = true): VectorSearchClient = {
    val index = embedded.select(col(idCol), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (validateDim) {
      // skip null embeddings: size(NULL) is NULL and would NPE on getInt
      // instead of raising the descriptive dim-mismatch message
      index.where(col("embedding").isNotNull)
        .select(size(col("embedding"))).head(1).foreach { r =>
          val d = r.getInt(0)
          require(d == embedder.dim,
            s"index embedding dim $d != embedder dim ${embedder.dim}")
        }
    }
    new VectorSearchClient(corpus, index, embedder, idCol)
  }

  /** Build by embedding `target` of every corpus row — the distributed
    * analogue of `from_dataframe` (reference: model/search/vector.py:96-137).
    * Requires a long-castable id; a null id (or null-casting id) fails fast
    * instead of silently matching nothing in the back-join.
    */
  def fromCorpus(corpus: DataFrame, target: String, idCol: String,
      embedder: Embedder): VectorSearchClient = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = embedder // avoid capturing `this`
    val index = corpus
      .select(col(idCol).cast("long"), doc_prefix(col(target)).as("__graft_text"))
      .map { r =>
        if (r.isNullAt(0)) throw new IllegalArgumentException(
          s"id column is null or not castable to long — refusing to build a vector index " +
            "that would silently drop rows in the back-join")
        (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1))
      }
      .mapPartitions { it =>
        // one embed batch per partition chunk = the reference's batch encode()
        it.grouped(1024).flatMap { chunk =>
          val vecs = emb.embedBatch(chunk.map(_._2))
          chunk.iterator.zip(vecs.iterator).map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF(idCol, "embedding")
      .persist(StorageLevel.MEMORY_AND_DISK)
    new VectorSearchClient(corpus, index, embedder, idCol)
  }
}
