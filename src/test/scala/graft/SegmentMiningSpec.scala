package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, Dedup, SimilarityJoin}

/** Segment-level (C4/CCNet-style) dedup, hard-negative mining, and ANN
  * recall@k — the round-10 mining/eval additions.
  */
class SegmentMiningSpec extends SparkTestBase {

  // ---- segmentDedup -------------------------------------------------------

  private def segCorpus = {
    val sp = spark
    import sp.implicits._
    Seq(
      (0L, "a b c x y z"), // shares "a b c" with doc1, "x y z" with doc3
      (1L, "a b c q r s"), // "q r s" unique
      (2L, "unique words only here now friend"),
      (3L, "x y z x y z"), // cross-doc dup with doc0 (and within-doc repeat)
      (4L, "a b c d"), // partial tail segment "d" survives
      (5L, "m n o m n o") // within-doc repeat ONLY: 1 distinct doc -> kept
    ).toDF("doc_id", "text")
  }

  test("segmentDedup drops cross-doc segments everywhere, keeps order") {
    val got = Dedup.segmentDedup(segCorpus, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(0L) == ((2L, 2L, "")), got(0L))
    assert(got(1L) == ((2L, 1L, "q r s")), got(1L))
    assert(got(2L) == ((2L, 0L, "unique words only here now friend")), got(2L))
    assert(got(3L) == ((2L, 2L, "")), got(3L))
    assert(got(4L) == ((2L, 1L, "d")), got(4L))
    // within-doc-only repetition is NOT cross-doc duplication at minDocs=2
    assert(got(5L) == ((2L, 0L, "m n o m n o")), got(5L))
  }

  test("segmentDedup: census route (windowMaxBytes=0) matches the window route") {
    // windowMaxBytes = 0 forces the skew-immune min/max-census+join plan
    // that the size router picks above the plan-time byte bound; both
    // routes must be row-identical on the same corpus.
    val windowed = Dedup.segmentDedup(segCorpus, "doc_id", "text", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val census = Dedup.segmentDedup(segCorpus, "doc_id", "text", window = 3,
        windowMaxBytes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(census.sameElements(windowed), census.mkString(";"))
  }

  test("segmentDedup census route: one ultra-hot segment shared by every doc") {
    // The skew case the router exists for: a boilerplate segment carried by
    // ALL docs. The census plan must drop it from every doc and keep each
    // doc's unique tail — with the hot hash shuffling as one compact
    // partial per map task, never one row per occurrence.
    val sp = spark
    import sp.implicits._
    val docs = (0L until 200L).map(i => (i, s"the same header here tail$i"))
      .toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "doc_id", "text", window = 4,
        windowMaxBytes = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.size == 200)
    (0L until 200L).foreach { i =>
      assert(got(i) == ((2L, 1L, s"tail$i")), s"doc $i -> ${got(i)}")
    }
  }

  test("segmentDedup minDocs raises the census bar") {
    // "a b c" lives in docs 0, 1, 4 (3 distinct docs); "x y z" only in 0, 3
    val got = Dedup.segmentDedup(segCorpus, "doc_id", "text",
        window = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(0L) == "x y z", got(0L)) // "a b c" dropped, "x y z" kept
    assert(got(3L) == "x y z x y z", got(3L))
  }

  // ---- hard negatives -----------------------------------------------------

  private def vecs(rows: (Long, Seq[Float])*) = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("hardNegatives: self excluded, band split by true cosine rank") {
    val corpus = vecs(
      0L -> Seq(1f, 0f), // the query itself
      1L -> Seq(1f, 0.1f), // nearest
      2L -> Seq(1f, 0.5f),
      3L -> Seq(0f, 1f),
      4L -> Seq(1f, 0.2f),
      5L -> Seq(-1f, 0f))
    val queries = corpus.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = SimilarityJoin.hardNegatives(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", negFrom = 2, negTo = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(4)))
    // by cosine distance to (1,0): v1 < v4 < v2 < v3 < v5; v0 (self) excluded
    assert(got.toSeq == Seq(
      (1L, 1L, "positive"), (2L, 4L, "hard_negative"), (3L, 2L, "hard_negative")),
      got.toSeq)
  }

  test("bruteForceTopKBatch matches an independent window ranking") {
    val sp = spark
    val corpus = vecs((0L to 63L).map(i =>
      i -> Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        math.cos(i * 0.11).toFloat, math.sin(i * 0.11).toFloat)): _*)
    val queries = corpus.where(col("vec_id").isin(1L, 5L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = SimilarityJoin.bruteForceTopKBatch(
        corpus, "vec_id", "embedding", queries, "qid", "qvec", k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = corpus.crossJoin(
        broadcast(queries.withColumnRenamed("qid", "q")))
      .select(col("q"), col("vec_id"), graft.functions.array_cosine_distance(
        col("embedding"), col("qvec")).as("d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q").orderBy(col("d").asc_nulls_last, col("vec_id").asc)))
      .where(col("rnk") <= 7)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1))).toSet
    assert(got == expected)
  }

  // ---- reciprocal-rank fusion ---------------------------------------------

  test("rrfFuse: both-list items outrank single-list, absences contribute 0") {
    val sp = spark
    import sp.implicits._
    // doc 10 is rank 3 lexically AND rank 2 semantically; doc 1 tops the
    // lexical list only; doc 20 tops the vector list only
    val lex = Seq((1L, 1L), (2L, 2L), (10L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((20L, 1L), (10L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val got = SimilarityJoin.rrfFuse(lex, vec, "doc_id", "rank", k = 5, c = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.head._2 == 10L, got.toSeq) // the only both-list doc wins
    assert(got.head._3 == 1.0 / 63 + 1.0 / 62, got.head)
    // single-list docs score exactly their one reciprocal term
    val m = got.map(r => r._2 -> r._3).toMap
    assert(m(1L) == 1.0 / 61 && m(20L) == 1.0 / 61, m)
    assert(m(2L) == 1.0 / 62 && m(30L) == 1.0 / 63, m)
    // ties (1 vs 20, both 1/61) break by id: 1 ranks above 20
    assert(got.map(_._2).toSeq == Seq(10L, 1L, 20L, 2L, 30L), got.toSeq)
  }

  // ---- ANN recall ---------------------------------------------------------

  test("recallAtK agrees with the probe/truth intersection, one row per query") {
    val corpus = vecs((0L to 63L).map(i =>
      i -> Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        math.cos(i * 0.11).toFloat, math.sin(i * 0.11).toFloat)): _*)
    val queries = corpus.where(col("vec_id").isin(1L, 5L, 9L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val index = AnnIndex.build(corpus, "vec_id", "embedding", stride = 16)
    // nprobe=1 so the probe genuinely misses out-of-bucket truth
    val got = index.recallAtK(queries, "qid", "qvec", k = 5, nprobe = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val probe = index.probeTopKBatch(queries, "qid", "qvec", 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val truth = SimilarityJoin.bruteForceTopKBatch(
        corpus, "vec_id", "embedding", queries, "qid", "qvec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got.keySet == Set(1L, 5L, 9L)) // every query reported
    for (q <- got.keySet) {
      val n = (probe & truth).count(_._1 == q).toLong
      assert(got(q) == ((n, n / 5.0)), s"q=$q got=${got(q)} want n=$n")
    }
    // sanity: with one probed bucket out of four, at least one query
    // should be missing some of its true top-5
    assert(got.values.exists(_._1 < 5L), s"recall trivially 1.0: $got")
  }
}
