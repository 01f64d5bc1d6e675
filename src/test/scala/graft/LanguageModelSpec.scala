package graft

import org.apache.spark.sql.functions._

import graft.ops.LanguageModel

/** Bigram LM scoring: counts, the integer-exact fit tier, the smoothed log
  * tier (driver-replayed), and the filter semantics on edge docs.
  */
class LanguageModelSpec extends SparkTestBase {
  private val sp = spark
  import sp.implicits._

  private def corpus = Seq(
    (0L, "the cat sat"),          // bigrams: "the cat", "cat sat"
    (1L, "the cat ran"),          // "the cat", "cat ran"
    (2L, "the cat sat"),          // duplicate of 0 — doubles its bigrams
    (3L, "zap"),                  // 1 token → no bigrams
    (4L, "qq zz")                 // unique bigram "qq zz"
  ).toDF("doc_id", "text")

  test("trainBigrams counts occurrences, not presence") {
    val cnt = LanguageModel.trainBigrams(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnt == Map(
      "the cat" -> 3L, "cat sat" -> 2L, "cat ran" -> 1L, "qq zz" -> 1L))
  }

  test("scoreDocs is integer-exact and keeps bigram-less docs null-scored") {
    val got = LanguageModel.scoreDocs(corpus, "doc_id", "text",
        LanguageModel.trainBigrams(corpus, "text"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == Seq(
      (0L, 2L, 5L, Some(2.5)),   // ("the cat"=3) + ("cat sat"=2) over 2
      (1L, 2L, 4L, Some(2.0)),   // 3 + 1 over 2
      (2L, 2L, 5L, Some(2.5)),
      (3L, 0L, 0L, None),        // no bigrams: present but unjudged
      (4L, 1L, 1L, Some(1.0)))) // its only bigram is unique in the corpus
  }

  test("unseen bigrams count in the denominator with zero contribution") {
    // score a NEW batch against the corpus-trained table: "zz qq" is an
    // unseen bigram (reversed) — it must DRAG THE AVERAGE DOWN, not
    // vanish from the denominator (a garbage doc must rank near 0, not
    // come back null as "unjudged")
    val batch = Seq((100L, "the cat zz qq")).toDF("doc_id", "text")
    val r = LanguageModel.scoreDocs(batch, "doc_id", "text",
      LanguageModel.trainBigrams(corpus, "text")).collect()
    // bigrams: "the cat"=3, "cat zz"=0 (unseen), "zz qq"=0 (unseen)
    assert(r.length == 1 && r(0).getLong(1) == 3 && r(0).getLong(2) == 3)
    assert(r(0).getDouble(3) == 1.0)
    val garbage = Seq((101L, "xx yy zz")).toDF("doc_id", "text")
    val g = LanguageModel.scoreDocs(garbage, "doc_id", "text",
      LanguageModel.trainBigrams(corpus, "text")).collect()
    assert(g(0).getLong(1) == 2 && g(0).getLong(2) == 0
      && g(0).getDouble(3) == 0.0)
  }

  test("fitFilter drops rare-bigram and too-short docs") {
    val kept = LanguageModel.fitFilter(corpus, "doc_id", "text",
        LanguageModel.trainBigrams(corpus, "text"), minFitAvg = 2.0)
      .select("doc_id").as[Long].collect().toSet
    // doc 4 (avg 1.0) and doc 3 (null score) drop; 0/1/2 survive
    assert(kept == Set(0L, 1L, 2L))
  }

  test("logScoreDocs matches a driver replay of the smoothed formula") {
    val bi = LanguageModel.trainBigrams(corpus, "text")
    val uni = LanguageModel.trainUnigrams(corpus, "text")
    val vocab = uni.count()
    val got = LanguageModel.logScoreDocs(corpus, "doc_id", "text",
        bi, uni, vocab, k = 1.0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    val biM = bi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val uniM = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def replay(text: String): (Double, Long) = {
      val lps = text.split(" ", -1).sliding(2).filter(_.length == 2).toSeq
        .map { bg =>
          val c2 = biM.getOrElse(bg.mkString(" "), 0L).toDouble
          val c1 = uniM.getOrElse(bg.head, 0L).toDouble
          math.log((c2 + 1.0) / (c1 + 1.0 * vocab))
        }
      (lps.sum / lps.size, lps.size.toLong)
    }
    for ((id, text) <- Seq(0L -> "the cat sat", 1L -> "the cat ran",
        4L -> "qq zz")) {
      val (want, n) = replay(text)
      val (gotLp, gotN) = got(id)
      assert(gotN == n, s"doc $id bigram count")
      assert(math.abs(gotLp - want) < 1e-12, s"doc $id: $gotLp vs $want")
    }
    // the bigram-less doc has no rows in the log tier
    assert(!got.contains(3L))
  }

  test("scoreDocs matches a driver replay on random cross-corpus batches") {
    val rnd = new scala.util.Random(8675309)
    val words = Vector("w1", "w2", "w3", "w4", "w5")
    def randomDocs(n: Int, startId: Long) = Seq.tabulate(n) { i =>
      (startId + i,
        Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    for (trial <- 1 to 3) {
      val train = randomDocs(25, 0)
      val batch = randomDocs(10, 1000) // disjoint ids, partially-unseen grams
      val trainDf = train.toDF("doc_id", "text")
      val batchDf = batch.toDF("doc_id", "text")
      val got = LanguageModel.scoreDocs(batchDf, "doc_id", "text",
          LanguageModel.trainBigrams(trainDf, "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      def bigrams(t: String) =
        t.split(" ", -1).sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val cnt = train.flatMap(d => bigrams(d._2)).groupBy(identity)
        .map { case (g, xs) => g -> xs.size.toLong }
      for ((id, text) <- batch) {
        val bgs = bigrams(text).toSeq
        val want = (bgs.size.toLong, bgs.map(cnt.getOrElse(_, 0L)).sum)
        assert(got(id) == want, s"trial $trial doc $id")
      }
    }
  }

  test("fitBuckets labels per-group tertiles; zero-bigram docs land in tail; NULL group kept") {
    // group g: fits 2500000 (doc0: (3+2)*1e6/2), 2000000 (doc1), 2500000
    // (doc2), 0 (doc3 — no bigrams); group NULL: doc4 alone
    val grouped = corpus.withColumn("grp",
      when(col("doc_id") === 4, lit(null).cast("string")).otherwise(lit("g")))
    val got = LanguageModel.fitBuckets(grouped, "doc_id", "text", "grp",
        LanguageModel.trainBigrams(corpus, "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L), "one row per doc, NULL group included")
    assert(got(3L)._1 == 0L && got(3L)._4 == "tail",
      "zero-bigram doc scores 0 and lands in tail")
    assert(got(0L)._4 == "head" && got(2L)._4 == "head")
    // local replay of the group-g cutoffs: sorted fits (0, 2000000,
    // 2500000, 2500000), q*(n-1) interpolation
    def pct(v: Seq[Long], q: Double): Double = {
      val s = v.sorted; val pos = q * (s.size - 1)
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    val fits = Seq(0L, 2000000L, 2500000L, 2500000L)
    assert(got(0L)._2 == pct(fits, 1.0 / 3) && got(0L)._3 == pct(fits, 2.0 / 3),
      s"cutoffs must equal the q*(n-1) replay: ${got(0L)}")
    // the single-doc NULL group is its own head (fit == both cutoffs)
    assert(got(4L)._4 == "head")
    // the cutoff table (#groups rows) must come back as a broadcast join,
    // never a shuffled one
    val plan = LanguageModel.fitBuckets(grouped, "doc_id", "text", "grp",
        LanguageModel.trainBigrams(corpus, "text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("unseen bigrams score low but finite (smoothing floor)") {
    val bi = LanguageModel.trainBigrams(corpus, "text")
    val uni = LanguageModel.trainUnigrams(corpus, "text")
    val unseen = Seq((9L, "cat the")).toDF("doc_id", "text") // reversed: unseen
    val r = LanguageModel.logScoreDocs(unseen, "doc_id", "text",
      bi, uni, vocabSize = uni.count(), k = 1.0).collect()
    assert(r.length == 1 && !r(0).isNullAt(1))
    assert(r(0).getDouble(1) < math.log(0.5)) // clearly penalized
  }
}
