package graft

import org.apache.spark.sql.functions._

import graft.ops.Mixture

/** Temperature (alpha = 1/2) mixture shares and sampling. */
class TemperatureMixtureSpec extends SparkTestBase {

  private def corpus = {
    val sp = spark
    import sp.implicits._
    // head source 100x the tail: uniform shares would be 50/50 on two
    // sources; sqrt shares give head/tail = 10/1
    val head = (0L until 400L).map(i => (i, "head", 25L))
    val tail = (1000L until 1004L).map(i => (i, "tail", 25L))
    (head ++ tail).toDF("doc_id", "source", "n_tok")
  }

  test("shares are sqrt-proportional with exact ppm arithmetic") {
    val got = Mixture.temperatureShares(corpus, col("source"), col("n_tok"),
        budget = 1100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // head: tot 10000, w 100; tail: tot 100, w 10; sw 110
    assert(got("head") == ((10000L, 100L, 100L * 1000000L / 110L,
      1100L * (100L * 1000000L / 110L) / 1000000L)), got("head"))
    assert(got("tail") == ((100L, 10L, 10L * 1000000L / 110L,
      1100L * (10L * 1000000L / 110L) / 1000000L)), got("tail"))
    // sqrt flattening: the head is 100x the tail in tokens but only 10x
    // in allocation
    assert(got("head")._4 == 999L && got("tail")._4 == 99L, got)
  }

  test("sampleTemperature keeps ~alloc/tot of each stratum, tail whole") {
    val kept = Mixture.sampleTemperature(corpus, col("source"),
        col("doc_id"), col("n_tok"), budget = 1100L)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // head keeps floor(1000*999/10000)=99 of 1000 buckets (~9.9% of 400
    // docs); tail keeps floor(1000*99/100)=990 buckets (~99%)
    assert(kept("head") > 20 && kept("head") < 60, kept)
    assert(kept("tail") >= 3, kept) // 4 docs, ~99% of buckets kept
    // determinism: same input -> same rows
    val again = Mixture.sampleTemperature(corpus, col("source"),
        col("doc_id"), col("n_tok"), budget = 1100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Mixture.sampleTemperature(corpus, col("source"),
        col("doc_id"), col("n_tok"), budget = 1100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }
}
