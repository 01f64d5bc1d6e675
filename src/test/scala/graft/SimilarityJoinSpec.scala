package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.SimilarityJoin

/** Broadcast-size guard and exact-vs-LSH routing for the cosine similarity
  * joins (the round-4 additions that shipped untested).
  */
class SimilarityJoinSpec extends SparkTestBase {

  private def vectors(n: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    // deterministic 8-dim vectors; pairs (2k, 2k+1) are near-identical
    (0 until n).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i / 2 * 7 + d * 3) + 2.0)
      val v = if (i % 2 == 1) base.map(_ * 1.001) else base
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
  }

  test("cosineJoinBroadcast guard trips above maxBroadcastRows") {
    val e = intercept[IllegalArgumentException] {
      SimilarityJoin.cosineJoinBroadcast(vectors(20), "id", "vec", 0.1,
        maxBroadcastRows = 10)
    }
    assert(e.getMessage.contains("exceeds 10 rows"))
    assert(e.getMessage.contains("cosineJoinLsh"))
  }

  test("cosineJoinBroadcast with Int.MaxValue skips the probe and runs") {
    val out = SimilarityJoin.cosineJoinBroadcast(vectors(10), "id", "vec", 0.1,
      maxBroadcastRows = Int.MaxValue)
    assert(out.count() >= 5) // the 5 planted near-identical pairs survive
  }

  test("cosineJoin routes to the exact tier below the threshold") {
    val plan = SimilarityJoin.cosineJoin(vectors(10), "id", "vec", 0.1,
      dim = 8, maxExactRows = 100)
      .queryExecution.analyzed.toString
    // the LSH tier is recognizable by its band posexplode; exact has none
    assert(!plan.contains("posexplode"))
  }

  test("cosineJoin routes to the LSH tier above the threshold") {
    val plan = SimilarityJoin.cosineJoin(vectors(30), "id", "vec", 0.1,
      dim = 8, maxExactRows = 10)
      .queryExecution.analyzed.toString
    assert(plan.contains("posexplode"))
  }

  test("cosineJoin with maxExactRows = Int.MaxValue forces exact without overflow") {
    val out = SimilarityJoin.cosineJoin(vectors(12), "id", "vec", 0.1,
      dim = 8, maxExactRows = Int.MaxValue)
    assert(out.count() >= 6)
  }

  test("both tiers agree on planted near-dup pairs") {
    val df = vectors(40)
    def pairs(out: DataFrame): Set[(Long, Long)] =
      out.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(SimilarityJoin.cosineJoinBroadcast(df, "id", "vec", 1e-5))
    val lsh = pairs(SimilarityJoin.cosineJoinLsh(df, "id", "vec", 1e-5, dim = 8))
    val planted = (0 until 40 by 2).map(i => (i.toLong, i + 1L)).toSet
    assert(planted.subsetOf(exact))
    // LSH recall is probabilistic in general, but near-identical vectors get
    // identical signatures, so every planted pair must bucket together
    assert(planted.subsetOf(lsh))
    // precision is exact on both tiers: nothing below tau sneaks in
    assert(exact == planted && lsh == planted)
  }
}
