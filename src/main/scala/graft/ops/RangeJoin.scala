package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join.
  *
  * Spark plans a pure range predicate (`start <= t AND t <= end`) as a
  * broadcast nested loop — O(|points| · |intervals|) comparisons, a
  * scale-killer the moment neither side is tiny. The standard fix (same
  * trick behind Databricks' range-join optimization and interval trees
  * flattened to grids): quantize time into fixed-width buckets, explode each
  * interval to every bucket it overlaps, tag each point with its single
  * bucket, equi-join on (keys…, bucket), and apply the exact predicate last.
  *
  * The equi-join shuffles both sides by (keys…, bucket) — hash-partitioned,
  * AQE-skew-splittable, 10^9-row safe. Each (point, interval) pair can meet
  * only in the point's own bucket, so no post-join dedup is needed.
  *
  * `bucketWidth` trades interval fan-out (explode factor ≈ avg interval
  * length / width + 1) against join selectivity (bucket population). Pick it
  * near the typical interval length; intervals orders of magnitude longer
  * than the width belong in a separate broadcast tier.
  */
object RangeJoin {

  /** @param points      frame with a numeric/castable point column
    * @param intervals   frame with numeric/castable [startCol, endCol] bounds
    *                    (inclusive both ends; rows with end < start drop out)
    * @param keys        optional equi-key columns present on both sides
    * @param pointCol    point column on `points` (castable to double)
    * @param startCol    interval start on `intervals`
    * @param endCol      interval end on `intervals`
    * @param bucketWidth bucket width in the same units as the columns
    * @param maxFanout   hard cap on buckets per interval: a single corrupt
    *                    row (bad unit conversion, sentinel end-date) would
    *                    otherwise materialize a multi-hundred-million-element
    *                    bucket array and kill the job far from the cause;
    *                    exceeding rows raise a descriptive error instead
    * @return inner join: every (point, interval) row pair with
    *         start <= point <= end on matching keys; all columns from both
    *         sides (names must not collide)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketWidth: Double, maxFanout: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxFanout > 0, s"maxFanout must be positive: $maxFanout")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(collisions.isEmpty, s"column names collide across sides: $collisions")

    val bucketOf = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("double") / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    // sequence() materializes the covered bucket range per interval — the
    // fan-out is (length/width)+1 rows, not a cross product
    val nBuckets = bucketOf(col(endCol)) - bucketOf(col(startCol)) + 1
    val iv = intervals
      .where(col(endCol).cast("double") >= col(startCol).cast("double"))
      .withColumn("__bucket", explode(
        when(nBuckets <= maxFanout,
          sequence(bucketOf(col(startCol)), bucketOf(col(endCol))))
          .otherwise(raise_error(concat(
            lit("RangeJoin: interval spans "), nBuckets,
            lit(s" buckets > maxFanout $maxFanout — widen bucketWidth, " +
              "raise maxFanout, or route outlier intervals to a broadcast tier"))))))
    p.join(iv, keys :+ "__bucket")
      .where(col(pointCol).cast("double") >= col(startCol).cast("double") &&
        col(pointCol).cast("double") <= col(endCol).cast("double"))
      .drop("__bucket")
  }
}
