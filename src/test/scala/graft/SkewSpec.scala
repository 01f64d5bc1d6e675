package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salting must never change results — only spread them. Verified against
  * the unsalted plan on a deliberately skewed dataset (90% one key).
  */
class SkewSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def skewed = {
    val hot = (1 to 900).map(i => ("hot", i.toLong, i * 1.5))
    val cold = (1 to 100).map(i => (s"k${i % 10}", i.toLong, i * 2.0))
    (hot ++ cold).toDF("key", "id", "value").repartition(8)
  }

  test("saltedSumCount equals the plain groupBy") {
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "value", Seq(col("id")), 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = skewed.groupBy("key")
      .agg(sum("value").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // compare with tolerance: two-phase summation order differs
    assert(salted.map(_._1) == plain.map(_._1))
    for ((k, s, c) <- salted) {
      val (_, ps, pc) = plain.find(_._1 == k).get
      assert(c == pc && math.abs(s - ps) < 1e-6, k)
    }
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val salted = Skew.saltedJoin(skewed, dim, "key", Seq(col("id")), 8)
      .select("key", "id", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val plain = skewed.join(dim, "key").select("key", "id", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("salting is deterministic across runs (no rand)") {
    val a = skewed.withColumn("s", pmod(xxhash64(col("id")), lit(16L)))
      .select("id", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = skewed.withColumn("s", pmod(xxhash64(col("id")), lit(16L)))
      .select("id", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
