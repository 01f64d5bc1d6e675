package graft

import org.apache.spark.sql.functions._

import graft.ops.Percentiles

/** Exact-vs-driver differential for the exact tier; published rank-error
  * bound for the approx (GK sketch) tier that unbounded groups must use.
  */
class PercentilesSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  // three groups with very different sizes and a seeded value distribution
  private lazy val data: Seq[(String, Double)] = {
    val rnd = new scala.util.Random(31337L)
    Seq(("a", 4000), ("b", 1500), ("c", 250)).flatMap { case (g, n) =>
      (0 until n).map(_ => (g, rnd.nextDouble() * 1000.0 + rnd.nextGaussian()))
    }
  }

  test("exact tier matches a driver-side interpolated percentile") {
    val got = Percentiles.exact(data.toDF("g", "v"), Seq("g"), "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      def interp(p: Double): Double = {
        val pos = p * (sorted.length - 1)
        val lo = pos.toInt
        if (lo == sorted.length - 1) sorted(lo)
        else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
      }
      assert(math.abs(got(g)._1 - interp(0.5)) < 1e-9, s"p50 group $g")
      assert(math.abs(got(g)._2 - interp(0.9)) < 1e-9, s"p90 group $g")
    }
  }

  test("approx tier honors the 1/accuracy rank-error contract per group") {
    val accuracy = 100 // eps = 1%
    val ps = Seq(0.1, 0.5, 0.9)
    val out = Percentiles.approx(data.toDF("g", "v"), Seq("g"), "v", ps, accuracy)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val eps = 1.0 / accuracy
    data.groupBy(_._1).foreach { case (g, rows) =>
      val values = rows.map(_._2)
      val n = values.size.toDouble
      val qs = Seq(out(g)._1, out(g)._2, out(g)._3)
      ps.zip(qs).foreach { case (p, q) =>
        val rank = values.count(_ <= q) / n
        // sketch returns an actual element: allow eps plus one-element slack
        assert(math.abs(rank - p) <= eps + 2.0 / n,
          s"group $g p=$p: returned $q has rank $rank")
      }
    }
  }

  test("approx memory stays bounded: sketch result is an actual group element") {
    val out = Percentiles.approx(data.toDF("g", "v"), Seq("g"), "v", Seq(0.5), 50)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.map(_._2).contains(out(g)), s"group $g: not a group element")
    }
  }

  test("ungrouped percentiles and argument validation") {
    val out = Percentiles.exact(data.toDF("g", "v"), Seq.empty, "v", Seq(0.25))
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == data.size.toLong)
    intercept[IllegalArgumentException] {
      Percentiles.exact(data.toDF("g", "v"), Seq("g"), "v", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      Percentiles.approx(data.toDF("g", "v"), Seq("g"), "v", Seq(0.5), 0)
    }
  }
}
