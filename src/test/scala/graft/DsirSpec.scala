package graft

import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR-style importance resampling: fixed-point hashed-n-gram fit,
  * per-doc scoring, deterministic top-n selection.
  */
class DsirSpec extends SparkTestBase {

  private val B = 32

  private def df(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private val target = df(
    1L -> "the theory of relativity explains gravity",
    2L -> "quantum mechanics describes subatomic particles")
  private val raw = df(
    10L -> "the theory of relativity explains gravity nicely", // target-like
    11L -> "click here to win a free prize now",
    12L -> "quantum mechanics describes subatomic particles too", // target-like
    13L -> "buy cheap pills online today click now")

  test("features = unigram + bigram instances; NULL text yields empty") {
    val f = df(1L -> "a b c").select(Dsir.features(col("text")))
      .collect()(0).getSeq[String](0)
    assert(f == Seq("a", "b", "c", "a b", "b c"))
    val g = df(2L -> null.asInstanceOf[String])
      .select(Dsir.features(col("text"))).collect()(0).getSeq[String](0)
    assert(g == Seq.empty)
  }

  test("weight table densifies the full bucket range with the smoothed default") {
    val w = Dsir.importanceWeights(target, col("text"), raw, col("text"), B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == (0L until B).toSet, "one row per bucket, always")
    // replay the contract locally for a bucket untouched by either sample:
    // rate = 1*Scale div (T+B) each side, w = rt*Scale div max(rr,1)
    def feats(t: String) = {
      val toks = t.split(" ").toSeq
      toks ++ toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    def bucketOf(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % B
    }
    val tf = Seq("the theory of relativity explains gravity",
      "quantum mechanics describes subatomic particles").flatMap(feats)
    val rf = Seq("the theory of relativity explains gravity nicely",
      "click here to win a free prize now",
      "quantum mechanics describes subatomic particles too",
      "buy cheap pills online today click now").flatMap(feats)
    val (tt, tr) = (tf.size.toLong, rf.size.toLong)
    for (b <- 0L until B) {
      val nt = tf.count(bucketOf(_) == b).toLong
      val nr = rf.count(bucketOf(_) == b).toLong
      val rt = (nt + 1) * Dsir.Scale / (tt + B)
      val rr = math.max((nr + 1) * Dsir.Scale / (tr + B), 1L)
      assert(w(b) == rt * Dsir.Scale / rr, s"bucket $b")
    }
  }

  test("scoring is one row per doc (NULL text scores 0) and target-like docs rank first") {
    val w = Dsir.importanceWeights(target, col("text"), raw, col("text"), B)
    val withNull = raw.union(df(14L -> null.asInstanceOf[String]))
    val scored = Dsir.scoreDocs(withNull, "doc_id", col("text"), w, B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored.keySet == Set(10L, 11L, 12L, 13L, 14L),
      "every input doc gets a score row")
    assert(scored(14L) == 0L)
    // the two target-overlapping docs must outscore the two spam docs
    assert(Seq(scored(10L), scored(12L)).min > Seq(scored(11L), scored(13L)).max,
      s"target-like docs must rank above spam: $scored")
    val top = Dsir.selectTop(
        Dsir.scoreDocs(withNull, "doc_id", col("text"), w, B), "doc_id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(10L, 12L))
  }

  test("selectTop ties break to the lowest id and the cut is TakeOrdered, not a global window") {
    val sp = spark
    import sp.implicits._
    val scored = Seq((5L, 100L), (3L, 100L), (9L, 100L), (1L, 50L))
      .toDF("doc_id", "score")
    val top = Dsir.selectTop(scored, "doc_id", 2)
    assert(top.collect().map(_.getLong(0)).toSet == Set(3L, 5L))
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("selectGumbelTop: deterministic per seed, distribution-shifting, TakeOrdered cut") {
    val sp = spark
    import sp.implicits._
    val scored = (1L to 200L).map(i => (i, i * 10000L)).toDF("doc_id", "score")
    val a = Dsir.selectGumbelTop(scored, "doc_id", 20, seed = 17L, tau = 250000L)
    // a TakeOrderedAndProject cut (never a global window), same as selectTop
    assert(a.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = a.collect()
    assert(rows.length == 20)
    // same seed → the SAME draw on re-evaluation; different seed → a
    // different one (the noise actually participates)
    val a2 = Dsir.selectGumbelTop(scored, "doc_id", 20, seed = 17L, tau = 250000L)
      .collect().map(_.getLong(0)).toSet
    val b = Dsir.selectGumbelTop(scored, "doc_id", 20, seed = 18L, tau = 250000L)
      .collect().map(_.getLong(0)).toSet
    val aIds = rows.map(_.getLong(0)).toSet
    assert(a2 == aIds, "same seed must redraw the same sample")
    assert(b != aIds, "a different seed should perturb the draw")
    // the draw leans target-like (top-half scores dominate) but is NOT the
    // deterministic top-20 — the noise explores below the hard cut
    assert(aIds.count(_ > 100L) >= 14, s"draw ignores scores: $aIds")
    assert(aIds != (181L to 200L).toSet, "tau=250000 should not degrade to selectTop")
    // gkey replays the table arithmetic: score·10⁶ + τ·g_micro
    val g = Dsir.gumbelTableMicro
    rows.foreach { r =>
      val id = r.getLong(0); val score = r.getLong(1); val gkey = r.getLong(2)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"17|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val bucket = (java.lang.Long.parseLong(hex, 16) % Dsir.GumbelBuckets).toInt
      assert(gkey == score * 1000000L + 250000L * g(bucket),
        s"doc $id: gkey $gkey != replay")
    }
  }

  test("degenerate fits stay defined: empty target gives uniform-numerator weights") {
    val w = Dsir.importanceWeights(
        target.where(lit(false)), col("text"), raw, col("text"), B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == (0L until B).toSet)
    assert(w.values.forall(_ >= 0L), "no NULL/negative weights on empty target")
  }
}
