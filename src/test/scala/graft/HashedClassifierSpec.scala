package graft

import org.apache.spark.sql.functions._

import graft.ops.HashedClassifier

/** Hashed linear classifier: integer-exact training, balanced weights,
  * separable-data sanity.
  */
class HashedClassifierSpec extends SparkTestBase {

  private def corpus = {
    val sp = spark
    import sp.implicits._
    // positives speak {good, clean, prose}, negatives {spam, junk, noise};
    // "the" is common ground
    Seq(
      (0L, "good clean prose the good", true),
      (1L, "clean prose good the prose", true),
      (2L, "prose good clean the", true),
      (3L, "spam junk noise the spam", false),
      (4L, "junk noise spam the junk", false),
      (5L, "noise spam junk the", false),
      // held-out (ids >= 10)
      (10L, "good prose the", true),
      (11L, "junk spam the", false)
    ).toDF("doc_id", "text", "label")
  }

  test("learns a separable vocabulary and classifies held-out docs") {
    val train = corpus.where(col("doc_id") < 10)
    val w = HashedClassifier.train(train, "text", col("label"), 1024)
    val got = HashedClassifier.score(corpus.where(col("doc_id") >= 10),
        "doc_id", "text", w, 1024)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got == Map(10L -> true, 11L -> false), got)
  }

  test("balanced weights: class-pure tokens get opposite signs, shared ~0") {
    val train = corpus.where(col("doc_id") < 10)
    val w = HashedClassifier.train(train, "text", col("label"), 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucket(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 1024
    }
    assert(w(bucket("good")) > 0 && w(bucket("prose")) > 0, w)
    assert(w(bucket("spam")) < 0 && w(bucket("junk")) < 0, w)
    // "the": 3 of 14 positive instances vs 3 of 14 negative -> rate diff 0
    assert(w(bucket("the")) == 0L, w(bucket("the")))
  }

  test("weight arithmetic is the documented fixed-point formula") {
    val sp = spark
    import sp.implicits._
    // 2 positive instances of "a" out of 3 positive tokens total;
    // 1 negative "a" out of 2 negative tokens total
    val df = Seq((0L, "a a b", true), (1L, "a c", false)).toDF("doc_id", "text", "label")
    val w = HashedClassifier.train(df, "text", col("label"), 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucket(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 1024
    }
    assert(w(bucket("a")) == 2L * 1000000L / 3L - 1L * 1000000L / 2L)
    assert(w(bucket("b")) == 1000000L / 3L)
    assert(w(bucket("c")) == -(1000000L / 2L))
  }

  test("score emits one row per input doc: NULL-text docs score 0, not vanish") {
    val sp = spark
    import sp.implicits._
    val train = corpus.where(col("doc_id") < 10)
    val w = HashedClassifier.train(train, "text", col("label"), 1024)
    val evalDocs = Seq(
      (20L, "good prose"),
      (21L, null.asInstanceOf[String]), // no tokens to explode
      (22L, "junk noise")
    ).toDF("doc_id", "text")
    val got = HashedClassifier.score(evalDocs, "doc_id", "text", w, 1024)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet == Set(20L, 21L, 22L), got)
    assert(got(21L) == ((0L, false)), got(21L))
    assert(got(20L)._2 && !got(22L)._2, got)
  }
}
