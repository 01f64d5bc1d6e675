package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dedup

/** Continuous corpus ingest with near-dup dedup — the streaming twin of the
  * `incremental_dedup` batch tier: documents arrive as a stream, each
  * micro-batch is deduped WITHIN itself and then AGAINST the static corpus,
  * and only survivors reach the sink.
  *
  * Implementation is `foreachBatch` over the proven batch operators rather
  * than a stateful streaming graph: near-dup dedup needs per-pair
  * aggregation and anti-joins whose streaming-native encodings would be
  * both stateful (unbounded pair state) and semantically weaker, while
  * `foreachBatch` gives every micro-batch the full batch API with
  * exactly-once sink semantics (epoch id). This is the documented
  * production pattern for batch-algorithm-on-a-stream, and it keeps
  * stream == batch BY CONSTRUCTION — the same `Dedup` functions run in both.
  *
  * Scale posture (unchanged from the batch tier): the corpus side is
  * prepared ONCE (shingled/banded, e.g. persisted or a bucketed table) and
  * never self-joined; per-epoch work is Σ_shingle |batch postings| ·
  * |corpus postings| — it scales with the BATCH, not the 100 TB corpus.
  */
object CorpusIngest {

  /** One micro-batch: keep-first dedup within the batch, then drop
    * everything near-duplicating the corpus. Pure batch function — the
    * streaming entrypoint below delegates here, and tests/oracles can call
    * it directly. Input frames carry (idCol, shingleCol, ...); survivors
    * keep the batch frame's full schema.
    */
  def processBatch(batch: DataFrame, corpusShingled: DataFrame, idCol: String,
      shingleCol: String, tau: Double): DataFrame = {
    val withinPairs = Dedup.jaccardJoin(
      batch.select(idCol, shingleCol), idCol, shingleCol, tau)
    val withinSurvivors = Dedup.survivors(batch, idCol, withinPairs)
    val crossPairs = Dedup.jaccardJoinAgainst(
      withinSurvivors.select(idCol, shingleCol), corpusShingled,
      idCol, shingleCol, tau)
    Dedup.incrementalSurvivors(withinSurvivors, idCol, crossPairs)
  }

  /** Start the continuous ingest: every micro-batch flows through
    * [[processBatch]] and `sink` receives (survivors, epochId) — write them
    * to the corpus store with epoch-idempotent semantics for exactly-once.
    */
  def dedupedIngest(newDocs: DataFrame, corpusShingled: DataFrame,
      idCol: String, shingleCol: String, tau: Double)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        sink(processBatch(batch, corpusShingled, idCol, shingleCol, tau),
          epochId)
      }
      .start()
}
