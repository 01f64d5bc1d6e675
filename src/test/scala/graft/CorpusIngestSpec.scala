package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.streaming.CorpusIngest

/** Streaming corpus ingest with near-dup dedup: micro-batches deduped
  * within themselves and against the static corpus; stream == batch by
  * construction (foreachBatch reuses the batch operators), which the spec
  * still verifies end to end.
  */
class CorpusIngestSpec extends SparkTestBase {

  private val Tau = 0.5

  private def shingled(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      TextOps.wordNGrams(col("text"), 3).as("sh"), col("text"))

  private def docsDf(rows: (Long, String)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    shingled(rows.toDF("doc_id", "text"))
  }

  private val corpus = docsDf(
    100L -> "the quick brown fox jumps over the lazy dog today",
    101L -> "completely different corpus text about spark and scala engines")

  test("per-batch: within-batch dups then corpus dups are dropped, fresh kept") {
    val batch = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog today", // corpus dup
      2L -> "an entirely new document with its own novel wording here",
      3L -> "an entirely new document with its own novel wording here", // within-batch dup of 2
      4L -> "unrelated fresh content mentioning neither foxes nor engines")
    val out = CorpusIngest.processBatch(batch, corpus, "doc_id", "sh", Tau)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 4L))
  }

  test("streaming ingest over two epochs matches per-batch application") {
    val sp = spark
    import sp.implicits._
    val epoch1 = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "an entirely new document with its own novel wording here")
    val epoch2 = Seq(
      3L -> "an entirely new document with its own novel wording here",
      4L -> "unrelated fresh content mentioning neither foxes nor engines")

    val stream = MemoryStream[(Long, String)](sp)
    val sdf = shingled(stream.toDF().toDF("doc_id", "text"))
    val got = mutable.Map[Long, Set[Long]]()
    val q = CorpusIngest.dedupedIngest(sdf, corpus, "doc_id", "sh", Tau) {
      (survivors, epochId) =>
        val ids = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
        got.synchronized { got(epochId) = got.getOrElse(epochId, Set.empty) ++ ids }
    }
    stream.addData(epoch1)
    q.processAllAvailable()
    stream.addData(epoch2)
    q.processAllAvailable()
    q.stop()

    val surviving = got.values.flatten.toSet
    // epoch 1: 1 is a corpus dup, 2 survives. epoch 2: 3 duplicates epoch-1's
    // doc 2 but the corpus frame here is STATIC, so 3 survives (see the
    // evolving-corpus test for the fold-in contract); 4 survives.
    assert(surviving == Set(2L, 3L, 4L))
    // identical to applying the batch function per epoch
    val manual1 = CorpusIngest.processBatch(docsDf(epoch1: _*), corpus, "doc_id", "sh", Tau)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val manual2 = CorpusIngest.processBatch(docsDf(epoch2: _*), corpus, "doc_id", "sh", Tau)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving == manual1 ++ manual2)
  }

  test("stateless media pipeline runs unchanged on a stream (audio stats, stream == batch)") {
    val sp = spark
    import sp.implicits._
    import graft.ops.Multimodal
    val f = Multimodal.DefaultSampleFormula
    val stream = MemoryStream[Long](sp)
    val clips = Multimodal.syntheticAudioFor(
      stream.toDF().toDF("media_id"), "media_id", 320)
    val q = Multimodal.audioFrameStats(clips, f.frameSize, 64)
      .writeStream.format("memory").queryName("audio_stream_test")
      .outputMode("append").start()
    stream.addData(1L, 2L, 3L)
    q.processAllAvailable()
    q.stop()
    val streamed = sp.table("audio_stream_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    val batch = Multimodal.audioFrameStats(
        Multimodal.syntheticAudioFor(Seq(1L, 2L, 3L).toDF("media_id"), "media_id", 320),
        f.frameSize, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("evolving corpus: folding survivors back in dedupes later epochs against them") {
    // the production loop: sink writes survivors to the corpus store, so the
    // next epoch's static frame includes them. Simulate the fold-in.
    var corpusNow = corpus
    def ingest(batch: DataFrame): Set[Long] = {
      val s = CorpusIngest.processBatch(batch, corpusNow, "doc_id", "sh", Tau)
      corpusNow = corpusNow.unionByName(s)
      s.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val e1 = ingest(docsDf(2L -> "an entirely new document with its own novel wording here"))
    val e2 = ingest(docsDf(3L -> "an entirely new document with its own novel wording here"))
    assert(e1 == Set(2L) && e2 == Set.empty)
  }
}
