package graft

import org.apache.spark.sql.functions._

import graft.functions.vector_sum

/** Elementwise vector-sum aggregate: driver differential, float widening,
  * null handling, and the dimension-mismatch contract.
  */
class VectorSumSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  test("grouped sums match a driver-side elementwise fold") {
    val rows = Seq(
      ("a", Seq(1.0, 2.0, 3.0)), ("a", Seq(0.5, -1.0, 4.0)),
      ("a", Seq(10.0, 0.0, -2.0)), ("b", Seq(7.0, 7.0, 7.0)))
    val got = rows.toDF("g", "v").repartition(4)
      .groupBy("g").agg(vector_sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).reduce((x, y) => x.zip(y).map(t => t._1 + t._2))
    }
    want.foreach { case (g, w) =>
      got(g).zip(w).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, g) }
    }
  }

  test("float arrays widen to double; null vectors skipped; null elements are 0") {
    val f = Seq(("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 4.0f)))
      .toDF("g", "v").groupBy("g").agg(vector_sum(col("v")).as("s"))
      .head().getSeq[Double](1).toSeq
    assert(f == Seq(4.0, 6.0))
    val withNulls = Seq(
      ("a", Seq[java.lang.Double](1.0, null)),
      ("a", null.asInstanceOf[Seq[java.lang.Double]]),
      ("a", Seq[java.lang.Double](2.0, 5.0)))
      .toDF("g", "v").groupBy("g").agg(vector_sum(col("v")).as("s"))
      .head().getSeq[Double](1).toSeq
    assert(withNulls == Seq(3.0, 5.0))
  }

  test("all-null group evaluates to null") {
    val out = Seq(("a", null.asInstanceOf[Seq[Double]]))
      .toDF("g", "v").groupBy("g").agg(vector_sum(col("v")).as("s")).head()
    assert(out.isNullAt(1))
  }

  test("dimension mismatch within a group raises the shared contract error") {
    val e = intercept[Exception] {
      Seq(("a", Seq(1.0, 2.0)), ("a", Seq(1.0, 2.0, 3.0)))
        .toDF("g", "v").groupBy("g").agg(vector_sum(col("v")).as("s")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }
}
