package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sampling, TextOps}

/** Hash sampling: deterministic, disjoint splits, roughly-uniform buckets. */
class SamplingSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("same sample on repeated evaluation (no rand())") {
    val a = Sampling.sampleRange(ids, col("id"), 100, 0, 10)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleRange(ids, col("id"), 100, 0, 10)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // ~10% with md5 uniformity; wide tolerance to stay non-flaky
    assert(a.size > 120 && a.size < 280, s"got ${a.size} of 2000")
  }

  test("trainHoldout partitions the frame exactly") {
    val (train, hold) = Sampling.trainHoldout(ids, col("id"), 10, 8)
    val t = train.collect().map(_.getLong(0)).toSet
    val h = hold.collect().map(_.getLong(0)).toSet
    assert(t.intersect(h).isEmpty)
    assert(t.union(h).size == 2000)
  }

  test("stratified keeps per-stratum fractions, deterministic and subset-consistent") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 3000L).map(i => (i, Seq("en", "fr", "de")(i.toInt % 3)))
      .toDF("id", "lang")
    val out = graft.ops.Sampling.stratified(df, col("lang"), col("id"),
      buckets = 100, fractions = Map("en" -> 10, "fr" -> 50), defaultKeep = 20)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 rows per lang; hash buckets are uniform-ish — generous bounds
    assert(counts("en") > 50 && counts("en") < 200)
    assert(counts("fr") > 400 && counts("fr") < 600)
    assert(counts("de") > 120 && counts("de") < 300)
    // deterministic on re-evaluation
    val again = graft.ops.Sampling.stratified(df, col("lang"), col("id"),
      buckets = 100, fractions = Map("en" -> 10, "fr" -> 50), defaultKeep = 20)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == again)
    // monotone: raising a stratum's keep-count only ADDS rows (same hash)
    val smaller = graft.ops.Sampling.stratified(df, col("lang"), col("id"),
      buckets = 100, fractions = Map("en" -> 5, "fr" -> 50), defaultKeep = 20)
      .where(col("lang") === "en").collect().map(_.getLong(0)).toSet
    val larger = out.where(col("lang") === "en").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(larger))
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.stratified(df, col("lang"), col("id"), 100,
        Map("en" -> 101))
    }
  }

  test("boundary splits are legal and empty; reversed ranges are not") {
    // 100% train: holdout side is [10, 10) — empty, not an error
    val (train, hold) = Sampling.trainHoldout(ids, col("id"), 10, 10)
    assert(hold.isEmpty && train.count() == 2000)
    assertThrows[IllegalArgumentException] {
      Sampling.sampleRange(ids, col("id"), 10, 5, 4)
    }
    assertThrows[IllegalArgumentException] {
      Sampling.hashBucket(col("id"), 0)
    }
  }

  test("kPerGroup takes exactly k per stratum, deterministically") {
    val sp = SparkTestBase.spark
    import sp.implicits._
    val df = (0L until 300L).map(i => (i, s"g${i % 3}"))
      .toDF("id", "grp")
    val a = Sampling.kPerGroup(df, col("grp"), col("id"), 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.size == 21 && a.groupBy(_._2).forall(_._2.size == 7))
    // re-evaluation picks the same rows (no rand())
    val b = Sampling.kPerGroup(df, col("grp"), col("id"), 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    // a 2-row stratum yields 2 rows, not an error
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp")
    assert(Sampling.kPerGroup(tiny, col("grp"), col("id"), 5).count() == 3)
    // k rows are a subset of k+1 rows (prefix property of the ranking)
    val k7 = a.map(_._1)
    val k8 = Sampling.kPerGroup(df, col("grp"), col("id"), 8)
      .collect().map(_.getLong(0)).toSet
    assert(k7.subsetOf(k8))
  }
}

/** Token chunking: windows cover every token, overlap by size-stride, and
  * degrade to one (possibly short) chunk for short docs.
  */
class ChunkingSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(TextOps.chunks(col("text"), size, stride).as("c"))
      .head().getSeq[String](0)

  test("known example: size 4, stride 2") {
    val got = chunksOf("a b c d e f g", 4, 2)
    assert(got == Seq("a b c d", "c d e f", "e f g"))
  }

  test("short and empty docs yield a single chunk; null text yields null") {
    assert(chunksOf("a b", 4, 2) == Seq("a b"))
    assert(chunksOf("", 4, 2) == Seq(""))
    val r = Seq[(String, Int)]((null, 0)).toDF("text", "x")
      .select(TextOps.chunks(col("text"), 4, 2).as("c")).head()
    assert(r.isNullAt(0))
  }

  test("every token position is covered at any length") {
    for (n <- 1 to 40) {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val got = chunksOf(text, 7, 5)
      val covered = got.zipWithIndex.flatMap { case (c, i) =>
        val start = i * 5
        c.split(" ").indices.map(start + _)
      }.toSet
      assert(covered == (0 until n).toSet, s"n=$n chunks=$got")
    }
  }
}
