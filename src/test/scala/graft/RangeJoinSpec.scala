package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** RangeJoin.pointInInterval: boundary inclusivity, exactly-once matching
  * for intervals spanning many buckets, randomized differential vs the
  * plain range-predicate join, and input validation.
  */
class RangeJoinSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def points = Seq(
    ("u1", 10.0, 1L), ("u1", 20.0, 2L), ("u1", 20.5, 3L),
    ("u1", 31.0, 4L), ("u2", 10.0, 5L)
  ).toDF("k", "t", "pid")

  private def intervals = Seq(
    ("u1", 10.0, 20.0, 100L), // hits t=10 (start), t=20 (end), not 20.5
    ("u1", 0.0, 95.0, 101L),  // spans many width-7 buckets; hits all u1 points
    ("u2", 50.0, 40.0, 102L)  // end < start: dropped
  ).toDF("k", "lo", "hi", "iid")

  test("inclusive bounds; multi-bucket intervals match exactly once") {
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = 7.0)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.size == out.toSet.size, "duplicate (point, interval) pairs")
    assert(out.toSet == Set(
      (1L, 100L), (2L, 100L),
      (1L, 101L), (2L, 101L), (3L, 101L), (4L, 101L)))
  }

  test("differential vs the plain range-predicate join on random data") {
    val rnd = new scala.util.Random(31337L)
    val ps = (1 to 300).map(i => (s"k${rnd.nextInt(6)}", rnd.nextDouble() * 100, i.toLong))
    val ivs = (1 to 200).map { i =>
      val lo = rnd.nextDouble() * 100
      (s"k${rnd.nextInt(6)}", lo, lo + rnd.nextDouble() * 30, i.toLong)
    }
    val p = ps.toDF("k", "t", "pid").repartition(8)
    val iv = ivs.toDF("k", "lo", "hi", "iid").repartition(8)
    val got = RangeJoin.pointInInterval(p, iv, Seq("k"), "t", "lo", "hi", 5.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pk, t, pid) <- ps
      (ik, lo, hi, iid) <- ivs
      if pk == ik && t >= lo && t <= hi
    } yield (pid, iid)).toSet
    assert(got == want)
  }

  test("plan: equi-join on (keys, bucket), never a nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketWidth = 7.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned a nested loop:\n$plan")
    assert(plan.contains("__bucket"), s"bucket key missing from the join:\n$plan")
  }

  test("a runaway interval fails fast instead of materializing its buckets") {
    val runaway = Seq(("u1", 0.0, 1.0e12, 9L)).toDF("k", "lo", "hi", "iid")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, runaway, Seq("k"), "t", "lo", "hi", 1.0)
        .collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("maxFanout"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("rejects colliding non-key columns and bad widths") {
    val bad = Seq(("u1", 1.0, 9L)).toDF("k", "t", "iid2")
      .withColumnRenamed("iid2", "pid") // collides with points.pid
      .withColumn("lo", lit(0.0)).withColumn("hi", lit(2.0))
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, bad, Seq("k"), "t", "lo", "hi", 1.0)
    }
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 0.0)
    }
  }
}
