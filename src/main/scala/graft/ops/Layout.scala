package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimension scan pruning.
  *
  * A single-column sort gives perfect min/max pruning on that column and
  * none on any other; interleaving the bits of several bucketed columns
  * (Morton / Z-order) gives GOOD pruning on every participating column at
  * once — the `OPTIMIZE ZORDER BY` capability of modern lakehouses, here as
  * a plain DataFrame transform: compute the z-value, range-partition and
  * sort by it, write. At 100 TB this is the difference between a filtered
  * scan reading ~sqrt-fraction of files versus all of them on the second
  * filter column.
  *
  * The z-value is pure integer bit arithmetic (shifts + masks over
  * non-negative bucket ids), so an external engine replays it exactly.
  */
object Layout {

  /** Interleave the low `bits` bits of each (non-negative, already
    * bucketed) column: bit j of column i lands at position `j * k + i`.
    * Columns must be < 2^bits; k * bits must fit a long (k * bits <= 63).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits ($bits) x columns (${cols.size}) must fit a long")
    val k = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * k + i)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** The same z-value as SQL text (same bit layout), for oracle replay. */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $j) & 1) << ${j * k + i})"
    terms.mkString(" | ")
  }

  /** Cluster `df` by the z-order of `cols` (bucketed to `bits` bits each
    * via modulo — monotone bucketing like range-quantiles also works; mod
    * keeps the oracle exact): range-partition on the z-value so files hold
    * contiguous z-ranges, sort within partitions for row-group locality.
    */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int,
      partitions: Int): DataFrame = {
    val mask = (1L << bits) - 1L
    val z = zValue(cols.map(c => c.cast("long").bitwiseAND(lit(mask))), bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
