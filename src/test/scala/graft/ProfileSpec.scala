package graft

import org.apache.spark.sql.functions._

import graft.ops.Profile

/** One-pass profiling: exact stats with nulls, and histogram bin edges. */
class ProfileSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def df = Seq[(java.lang.Long, java.lang.Double)](
    (1L, 10.0), (2L, 20.0), (3L, null), (4L, 20.0), (5L, 40.0)
  ).toDF("id", "v")

  test("numeric profiles counts, nulls, range, exact distincts per column") {
    val p = Profile.numeric(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5)))).toMap
    assert(p("id") == ((5L, 0L, 1.0, 5.0, 5L)))
    assert(p("v") == ((5L, 1L, 10.0, 40.0, 3L))) // null excluded, 20 deduped
  }

  test("numeric is a single one-pass aggregate (one scan in the plan)") {
    val plan = Profile.numeric(df, Seq("id", "v"))
      .queryExecution.optimizedPlan.toString
    // the unpivot happens over the one aggregated row — profiling N columns
    // must not plan N scans or a union of aggregates
    assert(!plan.contains("Union"), plan)
  }

  test("histogram matches a driver replay on random values (randomized)") {
    val rnd = new scala.util.Random(31415)
    for (trial <- 1 to 3) {
      val vals = Seq.fill(300)(rnd.nextDouble() * 120 - 10) // some out of range
      val (lo, hi, buckets) = (0.0, 100.0, 1 + rnd.nextInt(9))
      val got = Profile.histogram(vals.toDF("x"), col("x"), lo, hi, buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = vals.groupBy { x =>
        val raw = math.floor((x - lo) * buckets / (hi - lo))
        if (raw < 0) -1L else if (raw >= buckets) buckets.toLong else raw.toLong
      }.map { case (b, xs) => b -> xs.size.toLong }
      assert(got == want, s"trial $trial buckets=$buckets")
    }
  }

  test("histogram pins bin edges, clamps under/overflow, drops nulls") {
    val h = Profile.histogram(df, col("v"), lo = 10.0, hi = 40.0, buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10.0 -> bin 0; 20.0 x2 -> bin 1; 40.0 -> raw 3 == buckets -> overflow
    assert(h == Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
    val h2 = Profile.histogram(
      Seq(-5.0, 0.0, 29.9999, 30.0, 100.0).toDF("x"),
      col("x"), lo = 0.0, hi = 30.0, buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h2 == Map(-1L -> 1L, 0L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
