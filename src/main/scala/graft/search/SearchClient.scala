package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{array_cosine_distance, doc_prefix, query_prefix}

/** Spark-native semantic-search engine — the reference's core capability
  * (`BaseSearchClient`, reference: model/search/base.py:7-20, implemented by
  * `RuriDuckDBSearchClient`, model/search/vector.py:81-190), re-expressed as a
  * distributed plan:
  *
  *   corpus --(prefix "文章: ", mapPartitions embed)--> vector index [cached]
  *   query  --(prefix "クエリ: ", embed driver-side)--> literal vector
  *   index  --(cosine distance, TakeOrderedAndProject top-k)--> hits
  *   hits   --(broadcast join corpus, rank window)--> (rank, title, content, score)
  *
  * Scale design: the vector index keeps ONLY (id, embedding) — the text
  * columns live in the corpus table, so the brute-force scan reads a narrow
  * projection (column pruning; the reference keeps the same split at
  * vector.py:134 vs :87). Top-k uses sort+limit, which Catalyst plans as
  * TakeOrderedAndProject: per-partition bounded heap + k-row driver merge —
  * no global sort, no full shuffle, the exact distributed analogue of
  * DuckDB's Top-N optimization. The k-row result is broadcast for the
  * back-join, so corpus rows never shuffle.
  */
final class VectorSearchClient private (
    val corpus: DataFrame,      // (doc_id, <target/text cols...>)
    val index: DataFrame,       // (doc_id, embedding array<float>)
    val embedder: Embedder,
    idCol: String) extends Serializable {

  import VectorSearchClient._

  /** Distance of every indexed vector to one literal query vector. */
  private def distances(qvec: Array[Float]): DataFrame = {
    val qlit = typedLit(qvec.map(_.toDouble).toSeq)
    index.select(
      col(idCol),
      array_cosine_distance(col("embedding"), qlit).as("score"))
  }

  /** Top-n hits for a batch of text queries; one output DataFrame with a
    * `query_id` column (the reference returns List[DataFrame], one per query —
    * model/search/vector.py:140,170-188 — batched here by design, SURVEY §7.0).
    * Output: (query_id, rank [1-based], <corpus cols...>, score).
    */
  def searchTopN(queries: Seq[String], n: Int = 10): DataFrame = {
    require(queries.nonEmpty, "searchTopN needs at least one query")
    val spark = corpus.sparkSession
    // Queries are a tiny driver-side batch — embed locally, exactly as the
    // reference embeds the query batch in one encode() call (vector.py:167).
    val qvecs = embedder.embedBatch(queries.map(q => QueryPrefix + q))
    // Per-query top-k scans: each is a TakeOrderedAndProject (bounded heap),
    // unioned. For small Q this beats a window (no shuffle of the scan).
    val perQuery = qvecs.zipWithIndex.map { case (qv, qid) =>
      distances(qv)
        .orderBy(col("score").asc, col(idCol).asc)
        .limit(n)
        .withColumn("query_id", lit(qid.toLong))
    }
    val hits = perQuery.reduce(_ unionAll _)
    // Rank before the back-join: Spark joins do not preserve order (the
    // reference relies on pandas iloc order, vector.py:183-186 — SURVEY §7.3).
    val ranked = hits.withColumn(
      "rank",
      row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("score").asc, col(idCol).asc)))
    broadcast(ranked)
      .join(corpus, idCol)
      .select(
        (col("query_id") +: col("rank") +:
          corpus.columns.map(col) :+ col("score")): _*)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Single-query convenience matching the demo app's shape
    * (reference: app.py:8-17 — 1-based rank, renamed columns).
    */
  def search(query: String, n: Int = 10): DataFrame =
    searchTopN(Seq(query), n).drop("query_id")
}

object VectorSearchClient {
  /** Model-family prefixes — a semantic contract of the Ruri embedder
    * (reference: model/search/vector.py:123,164).
    */
  val DocPrefix = "文章: "
  val QueryPrefix = "クエリ: "

  /** Build from a corpus with precomputed embeddings (CI path — offline). */
  def fromEmbedded(corpus: DataFrame, embedded: DataFrame, idCol: String,
      embedder: Embedder): VectorSearchClient = {
    val index = embedded.select(col(idCol), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new VectorSearchClient(corpus, index, embedder, idCol)
  }

  /** Build by embedding `target` of every corpus row — the distributed
    * analogue of `from_dataframe` (reference: model/search/vector.py:96-137).
    */
  def fromCorpus(corpus: DataFrame, target: String, idCol: String,
      embedder: Embedder): VectorSearchClient = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = embedder // avoid capturing `this`
    val index = corpus
      .select(col(idCol).cast("long"), doc_prefix(col(target)).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // one embed batch per partition = the reference's batch encode()
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
