package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward and forward): for every left row, the single most
  * recent right row with `rightTime <= leftTime` (backward) or earliest
  * with `rightTime >= leftTime` (forward) on the same key (pandas
  * `merge_asof` / DuckDB `ASOF JOIN` semantics, exact-time matches
  * included).
  *
  * Spark has no native as-of join; the naive encodings both fail at scale:
  * a `left.join(right, key && rTime <= lTime)` range join explodes to every
  * (left, right-history) pair before picking the max, and a per-left-row
  * correlated top-1 re-shuffles the right side per query. This is the
  * composed-operator formulation instead (brief's preference (a)):
  *
  *   1. union left and right rows into one stream, right rows sorted before
  *      left rows at equal (key, time) so exact matches are visible;
  *   2. one window pass per key ordered by time carrying
  *      `last(right_payload, ignoreNulls)` forward;
  *   3. keep the left rows — each one holds the latest right payload at or
  *      before its time.
  *
  * Cost: ONE hash-partition shuffle + sort of |left| + |right| rows, the
  * same shape as any windowed aggregation — 10^9-row safe, skew bounded by
  * the hottest key like every per-key window. Right rows that tie on
  * (key, time) resolve deterministically to the greatest payload struct.
  */
object AsOfJoin {

  /** @param left         probe side; all its columns survive
    * @param right        history side
    * @param keys         equi-join key columns (same names both sides)
    * @param leftTime     event-time column on `left` (orderable; timestamp
    *                     or numeric)
    * @param rightTime    event-time column on `right`
    * @param rightPayload right columns to carry onto matches (emitted under
    *                     their own names; must not collide with left names)
    * @param toleranceSec optional max allowed `leftTime - rightTime` in
    *                     seconds (time columns must be castable to double
    *                     epoch); matches farther back are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightPayload, toleranceSec,
      Backward)

  /** Forward as-of join: the single EARLIEST right row with
    * `rightTime >= leftTime` per key (pandas `merge_asof(direction=
    * "forward")`; DuckDB `ASOF ... ON p.ts <= c.ts`). Same single-shuffle
    * union+window machinery as [[backward]], run over reversed time order.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightPayload, toleranceSec,
      Forward)

  /** Nearest as-of join: the right row with the smallest absolute time gap
    * in EITHER direction (pandas `merge_asof(direction="nearest")`); equal
    * gaps resolve to the backward match, like pandas. Computed as both
    * directional passes over ONE union + hash partitioning (the two window
    * sorts share the exchange), then a per-row least-gap choice — still a
    * single shuffle of |left| + |right| rows. `toleranceSec` bounds the
    * absolute gap on each side before the choice.
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightPayload, toleranceSec,
      Nearest)

  private sealed trait Direction
  private case object Backward extends Direction
  private case object Forward extends Direction
  private case object Nearest extends Direction

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSec: Option[Double], direction: Direction): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(right.columns.contains),
      s"rightPayload not all in right: $rightPayload")
    require(!rightPayload.exists(leftCols.contains),
      s"rightPayload collides with left columns: ${rightPayload.filter(leftCols.contains)}")

    // aligned union schema: keys, __t, __side, left row struct, right payload
    // struct. Null sides are typed from the frames' schemas so the union
    // lines up exactly.
    import org.apache.spark.sql.types.StructType
    val payFields = (rightPayload :+ rightTime).distinct
    val lrowSchema = StructType(leftCols.map(c => left.schema(c)))
    val paySchema = StructType(payFields.map(c => right.schema(c)))
    val l = left.select(
      keys.map(left.col) ++ Seq(
        left.col(leftTime).as("__t"), lit(1).as("__side"),
        struct(leftCols.map(left.col): _*).as("__lrow"),
        lit(null).cast(paySchema).as("__pay")): _*)
    val r = right.select(
      keys.map(right.col) ++ Seq(
        right.col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lrowSchema).as("__lrow"),
        struct(payFields.map(right.col): _*).as("__pay")): _*)

    // right before left at equal time (inclusive match); equal-time right
    // rows tie-break on the payload struct itself — deterministic. Forward
    // is the mirror image: walk time descending, so "last payload seen" is
    // the earliest right row at-or-after the left row. Nearest runs both
    // walks; the two windows share one hash partitioning (same keys), so
    // the exchange is reused and only a second sort is paid.
    def w(ord: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side").asc, col("__pay").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backMatch = last(col("__pay"), ignoreNulls = true).over(w(col("__t").asc))
    val fwdMatch = last(col("__pay"), ignoreNulls = true).over(w(col("__t").desc))
    val u = l.unionByName(r)
    val matched = (direction match {
      case Backward => u.withColumn("__mb", backMatch)
      case Forward => u.withColumn("__mf", fwdMatch)
      case Nearest => u.withColumn("__mb", backMatch).withColumn("__mf", fwdMatch)
    }).where(col("__side") === 1)

    def gapOf(m: String, fwd: Boolean): Column =
      if (fwd) col(s"$m.`$rightTime`").cast("double") - col("__t").cast("double")
      else col("__t").cast("double") - col(s"$m.`$rightTime`").cast("double")
    def tol(m: String, fwd: Boolean): Column = toleranceSec match {
      case Some(t) => when(gapOf(m, fwd) <= t, col(m))
      case None => col(m)
    }
    val chosen = direction match {
      case Backward => matched.withColumn("__match", tol("__mb", fwd = false))
      case Forward => matched.withColumn("__match", tol("__mf", fwd = true))
      case Nearest =>
        // per-side tolerance first, then least absolute gap; equal gaps
        // resolve backward (pandas merge_asof nearest semantics)
        matched
          .withColumn("__b", tol("__mb", fwd = false))
          .withColumn("__f", tol("__mf", fwd = true))
          .withColumn("__match",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(gapOf("__b", fwd = false) <= gapOf("__f", fwd = true),
                col("__b"))
              .otherwise(col("__f")))
    }
    chosen.select(
      leftCols.map(c => col(s"__lrow.`$c`").as(c)) ++
        rightPayload.map(c => col(s"__match.`$c`").as(c)): _*)
  }
}
