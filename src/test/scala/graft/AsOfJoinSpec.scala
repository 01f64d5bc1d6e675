package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** AsOfJoin.backward: correctness on a hand-built case (exact-time match,
  * no-match null, tolerance cutoff), a randomized differential check against
  * a naive per-row max formulation, and the one-shuffle plan contract.
  */
class AsOfJoinSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def left = Seq(
    ("u1", 100L, 1L), // after r@50, r@90 -> 90
    ("u1", 90L, 2L),  // exact-time match -> 90
    ("u1", 40L, 3L),  // before all right rows -> null
    ("u2", 500L, 4L), // only u2 row r@10 -> 10
    ("u3", 7L, 5L)    // no right rows for key -> null
  ).toDF("k", "t", "id")

  private def right = Seq(
    ("u1", 50L, "a"), ("u1", 90L, "b"), ("u2", 10L, "c"), ("u4", 1L, "d")
  ).toDF("k", "rt", "v")

  test("backward picks the latest at-or-before right row per key") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .select("id", "rt", "v")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), r.getString(2)))
      .toSet
    assert(out == Set(
      (1L, 90L, "b"), (2L, 90L, "b"), (3L, null, null),
      (4L, 10L, "c"), (5L, null, null)))
  }

  test("toleranceSec nulls matches farther back than the bound") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rt"),
        toleranceSec = Some(15.0))
      .select("id", "rt")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toSet
    // id 1: gap 10 <= 15 keeps 90; id 2: gap 0; id 4: gap 490 > 15 -> null
    assert(out == Set((1L, 90L), (2L, 90L), (3L, null), (4L, null), (5L, null)))
  }

  test("forward picks the earliest at-or-after right row per key") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .select("id", "rt", "v")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), r.getString(2)))
      .toSet
    // t=100 -> none after; t=90 -> exact 90; t=40 -> 50; u2 t=500 -> none;
    // u3 -> no rows
    assert(out == Set(
      (1L, null, null), (2L, 90L, "b"), (3L, 50L, "a"),
      (4L, null, null), (5L, null, null)))
  }

  test("forward tolerance nulls matches too far ahead") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rt"),
        toleranceSec = Some(5.0))
      .select("id", "rt")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toSet
    // id 3: gap 10 > 5 -> null; id 2: gap 0 keeps 90
    assert(out == Set((1L, null), (2L, 90L), (3L, null), (4L, null), (5L, null)))
  }

  test("differential vs naive max-based formulation on random data") {
    val rnd = new scala.util.Random(20260812L)
    val lRows = (1 to 400).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
    val rRows = (1 to 300).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toLong * 7))
    val l = lRows.toDF("k", "t", "id").repartition(8)
    val r = rRows.toDF("k", "rt", "v").repartition(8)

    val got = AsOfJoin.backward(l, r, Seq("k"), "t", "rt", Seq("rt"))
      .select("id", "rt")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // naive oracle: per left row, max right time <= t for the key
    val byKey = rRows.groupBy(_._1)
    val want = lRows.map { case (k, t, id) =>
      val cands = byKey.getOrElse(k, Seq.empty).map(_._2).filter(_ <= t)
      id -> (if (cands.isEmpty) -1L else cands.max)
    }.toMap
    assert(got == want)
  }

  test("nearest picks the least absolute gap, ties backward") {
    val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .select("id", "rt", "v")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1), r.getString(2)))
      .toSet
    // id 1 t=100: back gap 10 (90), no forward -> 90
    // id 2 t=90: exact both sides -> 90; id 3 t=40: forward 50 (gap 10) vs no back -> 50
    // id 4 t=500: back 10 only; id 5: none
    assert(out == Set(
      (1L, 90L, "b"), (2L, 90L, "b"), (3L, 50L, "a"),
      (4L, 10L, "c"), (5L, null, null)))
  }

  test("nearest tie at equal gaps resolves to the backward match") {
    val l = Seq(("u", 100L, 1L)).toDF("k", "t", "id")
    val r = Seq(("u", 90L, "back"), ("u", 110L, "fwd")).toDF("k", "rt", "v")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "t", "rt", Seq("v")).head().getString(3)
    assert(got == "back")
  }

  test("nearest tolerance bounds the absolute gap on both sides") {
    val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt", Seq("rt"),
        toleranceSec = Some(5.0))
      .select("id", "rt")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      .toSet
    // only the exact-time match (id 2) survives a 5s bound
    assert(out == Set((1L, null), (2L, 90L), (3L, null), (4L, null), (5L, null)))
  }

  test("nearest differential vs a naive least-gap formulation on random data") {
    val rnd = new scala.util.Random(8121202L)
    val lRows = (1 to 400).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
    val rRows = (1 to 300).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toLong * 7))
    val l = lRows.toDF("k", "t", "id").repartition(8)
    val r = rRows.toDF("k", "rt", "v").repartition(8)
    val got = AsOfJoin.nearest(l, r, Seq("k"), "t", "rt", Seq("rt"))
      .select("id", "rt")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    val byKey = rRows.groupBy(_._1)
    val want = lRows.map { case (k, t, id) =>
      val cands = byKey.getOrElse(k, Seq.empty).map(_._2)
      val back = cands.filter(_ <= t).sorted.lastOption
      val fwd = cands.filter(_ >= t).sorted.headOption
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) => Some(if (t - b <= f - t) b else f)
        case (b, f) => b.orElse(f)
      }
      id -> pick.getOrElse(-1L)
    }.toMap
    assert(got == want)
  }

  test("nearest plan: still one hash-partition shuffle (windows share the exchange)") {
    val df = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("plan: one hash-partition shuffle, no join node") {
    val df = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
    df.collect()
    // AQE's toString prints the Initial Plan too — count the final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
