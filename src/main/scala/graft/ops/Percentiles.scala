package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped percentiles in two tiers.
  *
  * The EXACT tier (`percentile`) materializes every group's values inside
  * the aggregation buffer: memory is O(rows per group) per group, which is
  * fine at test scale and an executor-OOM at 100 TB the moment one group is
  * hot. The APPROX tier (`approx_percentile`, GK sketch) holds
  * O(accuracy·log n) per group regardless of group size — that is the
  * production path for unbounded groups; its published contract is a rank
  * error of at most 1/accuracy of the group's rows (asserted in
  * PercentilesSpec).
  *
  * Rule of thumb: exact when a group is known-bounded (dimension keys),
  * approx everywhere else.
  */
object Percentiles {

  private def checkPs(ps: Seq[Double]): Unit =
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")

  /** Exact interpolated percentiles, one column `p<percent>` per requested
    * fraction. Buffers each group's values — bounded groups only.
    */
  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    checkPs(ps)
    agg(df, groupCols, ps.map(p =>
      expr(s"percentile($valueCol, $p)").as(nameOf(p))))
  }

  /** Sketch-based percentiles with bounded memory per group. `accuracy`
    * trades memory for a <= 1/accuracy rank-error bound.
    */
  def approx(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    checkPs(ps)
    require(accuracy > 0, s"accuracy must be positive: $accuracy")
    agg(df, groupCols, ps.map(p =>
      expr(s"approx_percentile($valueCol, $p, $accuracy)").as(nameOf(p))))
  }

  private def nameOf(p: Double): String =
    "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")

  private def agg(df: DataFrame, groupCols: Seq[String],
      cols: Seq[Column]): DataFrame = {
    val aggs = cols :+ count(lit(1)).as("n")
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
