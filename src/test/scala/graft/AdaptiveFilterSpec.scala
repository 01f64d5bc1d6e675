package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Per-group adaptive quantile filtering. */
class AdaptiveFilterSpec extends SparkTestBase {

  test("keeps rows at or above their own group's exact quantile") {
    val sp = spark
    import sp.implicits._
    // group a: 10,20,30,40 -> median 25 (interpolated); keep 30,40
    // group b: 100,200,300 -> median 200 (exact element); keep 200,300
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("b", 5L, 100L), ("b", 6L, 200L), ("b", 7L, 300L)
    ).toDF("src", "id", "len")
    val got = Sampling.adaptiveQuantileFilter(df, col("src"), col("len"), 0.5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(got == Map(3L -> 25.0, 4L -> 25.0, 6L -> 200.0, 7L -> 200.0), got)
  }

  test("a global cutoff would misfilter; the adaptive one is per-group") {
    val sp = spark
    import sp.implicits._
    // short-form group survives its own median even though every row is
    // below the long-form group's minimum
    val df = Seq(
      ("short", 1L, 5L), ("short", 2L, 9L),
      ("long", 3L, 1000L), ("long", 4L, 2000L)
    ).toDF("src", "id", "len")
    val kept = Sampling.adaptiveQuantileFilter(df, col("src"), col("len"), 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L), kept) // each group keeps its upper half
  }

  test("quantile interpolation matches the q*(n-1) definition") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 5L).map(i => ("g", i, i * 10L)).toDF("src", "id", "len")
    // q=0.25 over 10,20,30,40,50: index 1.0 -> exactly 20
    val cut = Sampling.adaptiveQuantileFilter(df, col("src"), col("len"), 0.25)
      .select("cutoff").head.getDouble(0)
    assert(cut == 20.0, cut)
  }
}
