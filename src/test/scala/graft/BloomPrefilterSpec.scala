package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Bloom membership prefilter (Dedup.corpusBloom + bloom_might_contain +
  * bloomIncrementalSurvivors): no false negatives ever, bounded false
  * positives, and the fast-pathed incremental dedup is row-identical to
  * the plain anti-join.
  */
class BloomPrefilterSpec extends SparkTestBase {

  private def keyed(n: Int, tag: String) = {
    val sp = spark
    import sp.implicits._
    (0 until n).map(i => (i.toLong, s"$tag-key-$i")).toDF("id", "k")
  }

  test("every inserted key probes true (zero false negatives)") {
    val corpus = keyed(500, "corpus")
    val filter = Dedup.corpusBloom(corpus, "k", expectedItems = 500)
    val misses = corpus
      .where(!graft.functions.bloom_might_contain(col("k"), filter))
      .count()
    assert(misses == 0, s"bloom false negatives: $misses")
  }

  test("false-positive rate on unseen keys stays near the configured fpp") {
    val corpus = keyed(500, "corpus")
    val unseen = keyed(2000, "other")
    val filter = Dedup.corpusBloom(corpus, "k", expectedItems = 500, fpp = 0.03)
    val fp = unseen
      .where(graft.functions.bloom_might_contain(col("k"), filter))
      .count()
    assert(fp <= 2000 * 0.03 * 3, s"fp count $fp way above 3x fpp bound")
  }

  test("long keys probe through the long path") {
    val sp = spark
    import sp.implicits._
    val corpus = (0L until 300L).map(i => Tuple1(i * 7)).toDF("k")
    val filter = Dedup.corpusBloom(corpus, "k", expectedItems = 300)
    assert(corpus.where(!graft.functions.bloom_might_contain(col("k"), filter))
      .count() == 0)
  }

  test("bloom-fast-pathed incremental dedup is row-identical to the plain anti-join") {
    val sp = spark
    import sp.implicits._
    // batch shares ids 0..99 with the corpus (true dups), 100..399 unseen
    val corpus = (0 until 200).map(i => (i.toLong, s"shared-$i")).toDF("id", "k")
    val batch = ((0 until 100).map(i => (1000L + i, s"shared-$i")) ++
      (100 until 400).map(i => (1000L + i, s"fresh-$i"))).toDF("id", "k")
    val filter = Dedup.corpusBloom(corpus, "k", expectedItems = 200)
    val fast = Dedup.bloomIncrementalSurvivors(batch, corpus, "k", filter)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    val plain = batch.join(corpus.select("k").distinct(), Seq("k"), "left_anti")
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(fast == plain, s"fast path diverged: ${fast.size} vs ${plain.size}")
    assert(plain.size == 300, s"expected the 300 fresh rows: ${plain.size}")
  }

  test("the probe is deterministic across two independently built filters") {
    val corpus = keyed(500, "corpus")
    val probeSet = keyed(1000, "probe")
    def flags(f: org.apache.spark.util.sketch.BloomFilter) = probeSet
      .select(col("id"), graft.functions.bloom_might_contain(col("k"), f).as("m"))
      .orderBy("id").collect().map(_.getBoolean(1)).toSeq
    val a = flags(Dedup.corpusBloom(corpus, "k", expectedItems = 500))
    val b = flags(Dedup.corpusBloom(corpus.repartition(7), "k", expectedItems = 500))
    assert(a == b, "filter bits must not depend on partitioning/order")
  }
}
