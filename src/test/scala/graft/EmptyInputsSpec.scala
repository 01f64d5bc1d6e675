package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops._

/** Every operator must degrade to an empty (or well-defined) result on
  * empty input — the state a production pipeline hits whenever an upstream
  * filter matches nothing. No operator may throw or hang.
  */
class EmptyInputsSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptySh: DataFrame =
    emptyDocs.select(col("doc_id"), TextOps.wordNGrams(col("text"), 3).as("sh"))
  private def emptyVecs: DataFrame =
    Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
  private def emptyPairs: DataFrame =
    Seq.empty[(Long, Long)].toDF("a", "b")

  test("dedup tiers on empty corpora") {
    assert(Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() == 0)
    assert(Dedup.jaccardJoin(emptySh, "doc_id", "sh", 0.5).count() == 0)
    assert(Dedup.jaccardJoinAgainst(emptySh, emptySh, "doc_id", "sh", 0.5).count() == 0)
    assert(Dedup.minhashSignatures(emptySh, "doc_id", "sh", 8).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, "doc_id", split(col("text"), " ")).count() == 0)
    assert(Dedup.dropHotShingles(emptySh, "doc_id", "sh", 0.5).count() == 0)
    assert(Dedup.survivors(emptyDocs, "doc_id", emptyPairs).count() == 0)
    assert(Dedup.incrementalSurvivors(emptyDocs, "doc_id", emptyPairs).count() == 0)
  }

  test("connected components on an empty edge set") {
    assert(Dedup.components(emptyPairs).count() == 0)
    assert(Dedup.componentsStar(emptyPairs).count() == 0)
  }

  test("similarity joins and ANN on empty vector sets") {
    assert(SimilarityJoin.cosineJoinBroadcast(emptyVecs, "id", "vec", 0.5).count() == 0)
    assert(SimilarityJoin.cosineJoinLsh(emptyVecs, "id", "vec", 0.5, dim = 4).count() == 0)
    assert(SimilarityJoin.cosineJoin(emptyVecs, "id", "vec", 0.5, dim = 4).count() == 0)
    val idx = AnnIndex.build(emptyVecs, "id", "vec", stride = 4)
    assert(idx.bruteForceTopK(Array(1.0, 0.0, 0.0, 0.0), 5).count() == 0)
    assert(idx.probeTopK(Array(1.0, 0.0, 0.0, 0.0), 5).count() == 0)
  }

  test("time joins with an empty side") {
    val left = Seq(("u", 10L, 1L)).toDF("k", "t", "id")
    val noRight = Seq.empty[(String, Long, String)].toDF("k", "rt", "v")
    for (dir <- Seq("b", "f", "n")) {
      val out = dir match {
        case "b" => AsOfJoin.backward(left, noRight, Seq("k"), "t", "rt", Seq("v"))
        case "f" => AsOfJoin.forward(left, noRight, Seq("k"), "t", "rt", Seq("v"))
        case _ => AsOfJoin.nearest(left, noRight, Seq("k"), "t", "rt", Seq("v"))
      }
      val rows = out.collect()
      assert(rows.length == 1 && rows(0).isNullAt(3), s"direction $dir")
    }
    val noLeft = Seq.empty[(String, Long, Long)].toDF("k", "t", "id")
    assert(AsOfJoin.backward(noLeft, noRight, Seq("k"), "t", "rt", Seq("v")).count() == 0)
    val points = Seq.empty[(String, Double)].toDF("k", "p")
    val ivals = Seq.empty[(String, Double, Double)].toDF("k", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, ivals, Seq("k"), "p", "lo", "hi", 10.0)
      .count() == 0)
  }

  test("text scoring and sampling on empty corpora") {
    assert(TextOps.bm25(emptyDocs, "doc_id", TextOps.tokens(col("text")),
      Seq("x"), inlineTermLimit = 100).count() == 0)
    assert(TextOps.bm25(emptyDocs, "doc_id", TextOps.tokens(col("text")),
      Seq("x"), inlineTermLimit = 0).count() == 0)
    assert(Percentiles.exact(emptyDocs, Seq("text"), "doc_id", Seq(0.5)).count() == 0)
    assert(Percentiles.approx(emptyDocs, Seq("text"), "doc_id", Seq(0.5)).count() == 0)
    assert(Sampling.stratified(emptyDocs, col("text"), col("doc_id"), 10,
      Map("en" -> 5)).count() == 0)
    assert(Skew.saltedSumCount(
      Seq.empty[(String, Double, Long)].toDF("k", "value", "event_id"),
      Seq("k"), "value", Seq(col("event_id")), salts = 4).count() == 0)
  }

  test("media operators on an empty table") {
    val media = Multimodal.syntheticMedia(spark, 0)
    assert(Multimodal.extractFeatures(media).count() == 0)
    assert(Multimodal.resizeImages(media, 8, 8).count() == 0)
    assert(Multimodal.gridChannelStats(media, 2).count() == 0)
    assert(Multimodal.dhash64(media).count() == 0)
    assert(Multimodal.dedupByContent(media).count() == 0)
  }

  test("round-6 operators: mixture, audio, ingest, star components on empty input") {
    assert(Mixture.toTokenBudget(emptyDocs, col("text"), col("doc_id"),
      TextOps.tokenCount(col("text")), targetTokens = 1000).count() == 0)
    val noClips = Multimodal.syntheticAudioFor(
      Seq.empty[Long].toDF("id"), "id", 100)
    assert(Multimodal.audioFrameStats(noClips, 160).count() == 0)
    // a clip with zero samples decodes to zero frames, not a crash
    val zeroSample = Multimodal.syntheticAudioFor(Seq(1L).toDF("id"), "id", 0)
    assert(Multimodal.audioFrameStats(zeroSample, 160).count() == 0)
    // streaming ingest: empty batch, and a batch against an empty corpus
    assert(graft.streaming.CorpusIngest
      .processBatch(emptySh, emptySh, "doc_id", "sh", 0.5).count() == 0)
    val oneDoc = Seq((1L, "some fresh text with enough words to shingle"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.wordNGrams(col("text"), 3).as("sh"))
    assert(graft.streaming.CorpusIngest
      .processBatch(oneDoc, emptySh, "doc_id", "sh", 0.5).count() == 1)
    assert(Dedup.componentsStar(emptyPairs, "id").count() == 0)
  }

  test("LM scoring, vocab, and the linear embedder on empty input") {
    // empty train table: every bigram is unseen — the doc scores 0.0
    // (garbage-ranked), its bigrams still count in the denominator
    val oneDoc = Seq((7L, "a b c")).toDF("doc_id", "text")
    val scored = LanguageModel.scoreDocs(oneDoc, "doc_id", "text",
      LanguageModel.trainBigrams(emptyDocs, "text")).collect()
    assert(scored.length == 1 && scored(0).getLong(1) == 2
      && scored(0).getLong(2) == 0 && scored(0).getDouble(3) == 0.0)
    assert(LanguageModel.scoreDocs(emptyDocs, "doc_id", "text",
      LanguageModel.trainBigrams(emptyDocs, "text")).count() == 0)
    assert(LanguageModel.fitFilter(emptyDocs, "doc_id", "text",
      LanguageModel.trainBigrams(emptyDocs, "text"), 1.0).count() == 0)

    val emptyVocab = Vocab.induce(emptyDocs, "text", 8)
    assert(emptyVocab.count() == 0)
    // everything is OOV against an empty vocab; packing still keeps order
    val enc = Vocab.encode(oneDoc, "doc_id", "text", emptyVocab).collect()
    assert(enc.length == 3 && enc.forall(_.getLong(2) == -1L))
    val packed = Vocab.encodePacked(oneDoc, "doc_id", "text", emptyVocab)
      .collect()
    assert(packed.length == 1
      && packed(0).getSeq[Long](1) == Seq(-1L, -1L, -1L))
    assert(Vocab.encode(emptyDocs, "doc_id", "text", emptyVocab).count() == 0)

    // empty batch through the embedder contract
    assert(graft.search.LinearModelEmbedder(2, 4,
      Array.fill(8)(0.5f)).embedBatch(Seq.empty).isEmpty)
  }

  test("batched ANN probe, profiling, and packing on empty input") {
    val someVecs = Seq((0L, Seq(1.0, 0.0)), (64L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val idx = graft.ops.AnnIndex.build(someVecs, "id", "vec", stride = 64)
    val noQueries = Seq.empty[(Long, Seq[Double])].toDF("qid", "qvec")
    assert(idx.probeTopKBatch(noQueries, "qid", "qvec", 5).count() == 0)

    assert(Profile.histogram(emptyDocs, col("doc_id"), 0.0, 10.0, 4)
      .count() == 0)
    val p = Profile.numeric(emptyDocs, Seq("doc_id")).collect()
    assert(p.length == 1 && p(0).getLong(1) == 0) // one all-zero stats row

    val noToks = Seq.empty[(Long, Long, Long)].toDF("id", "pos", "token_id")
    val noOffs = Packing.sequenceOffsets(
      Seq.empty[(Long, Long)].toDF("id", "n"), "id", col("n"), binSize = 8)
    assert(Packing.packTokens(noToks, "id", 8, noOffs).count() == 0)
  }

  test("round-10 mining/maintenance ops on empty and degenerate input") {
    assert(Dedup.segmentDedup(emptyDocs, "doc_id", "text", 3).count() == 0)
    assert(Dedup.minhashCalibration(emptySh, "doc_id", "sh").count() == 0)
    assert(Dedup.softDedupWeights(emptyDocs, "doc_id", emptyPairs).count() == 0)
    assert(SnapshotDelta.delta(emptyDocs, emptyDocs, "doc_id", "text").count() == 0)
    // one empty side: everything classifies to the other side's status
    val some = Seq((1L, "x")).toDF("doc_id", "text")
    assert(SnapshotDelta.delta(emptyDocs, some, "doc_id", "text")
      .head.getString(1) == "added")
    assert(SnapshotDelta.delta(some, emptyDocs, "doc_id", "text")
      .head.getString(1) == "removed")

    val someVecs2 = (0L to 3L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("id", "vec")
    val noQ = Seq.empty[(Long, Seq[Double])].toDF("qid", "qvec")
    assert(SimilarityJoin.bruteForceTopKBatch(
      someVecs2, "id", "vec", noQ, "qid", "qvec", 3).count() == 0)
    assert(SimilarityJoin.hardNegatives(
      someVecs2, "id", "vec", noQ, "qid", "qvec", 2, 3).count() == 0)

    // single-class training: the absent class's rate term is defined 0 —
    // weights stay non-NULL and scoring still runs (all-positive corpus
    // scores positive)
    val onlyPos = Seq((1L, "aa bb", true), (2L, "aa cc", true))
      .toDF("doc_id", "text", "label")
    val w = HashedClassifier.train(onlyPos, "text", col("label"), 64)
    assert(w.where(col("w").isNull).count() == 0)
    val scored = HashedClassifier.score(onlyPos, "doc_id", "text", w, 64)
    assert(scored.where(col("score").isNull).count() == 0)
    assert(scored.where(!col("predicted")).count() == 0)

    assert(Mixture.temperatureShares(emptyDocs, col("text"), col("doc_id"),
      100L).count() == 0)
    assert(Sampling.adaptiveQuantileFilter(emptyDocs, col("text"),
      col("doc_id"), 0.5).count() == 0)
  }

  test("round-11 ops (DSIR, fuzzy decontamination, fit buckets) on empty input") {
    val some = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    // empty fit sides: weights stay defined over the full bucket range
    val w = Dsir.importanceWeights(emptyDocs, col("text"),
      emptyDocs, col("text"), 16)
    assert(w.count() == 16 && w.where(col("w").isNull).count() == 0)
    // empty scoring input -> empty; non-empty input with empty-fit weights
    // still scores (one row per doc)
    assert(Dsir.scoreDocs(emptyDocs, "doc_id", col("text"), w, 16).count() == 0)
    assert(Dsir.scoreDocs(some, "doc_id", col("text"), w, 16).count() == 1)
    assert(Dsir.selectTop(
      Dsir.scoreDocs(emptyDocs, "doc_id", col("text"), w, 16),
      "doc_id", 5).count() == 0)
    // fuzzy decontamination: empty corpus, empty benchmark, both
    assert(Decontaminate.fuzzyContaminatedIds(emptyDocs, "doc_id",
      col("text"), some, "doc_id", col("text"), 2, 0.5).count() == 0)
    assert(Decontaminate.fuzzyContaminatedIds(some, "doc_id", col("text"),
      emptyDocs, "doc_id", col("text"), 2, 0.5).count() == 0)
    assert(Decontaminate.fuzzyDecontaminate(some, "doc_id", col("text"),
      emptyDocs, "doc_id", col("text"), 2, 0.5).count() == 1)
    // fit buckets: empty corpus -> empty; the percentile aggregate must
    // not throw on zero groups
    assert(LanguageModel.fitBuckets(emptyDocs, "doc_id", "text", "text",
      LanguageModel.trainBigrams(emptyDocs, "text")).count() == 0)
  }
}
