package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data profiling — the "know your data" QA stage every pipeline
  * runs before training on a new drop: per-column counts, null counts,
  * ranges, exact distincts, and fixed-range histograms.
  *
  * Scale shape: [[numeric]] is ONE aggregate over the scan (multiple
  * `count(DISTINCT)`s plan as a single Expand pass — rows multiply by the
  * profiled-column count map-side, but the scan runs once and the shuffle
  * carries partial aggregates only), then a driver-free unpivot of the one
  * wide result row. [[histogram]] is one groupBy on an integer bucket
  * expression. Nothing is corpus-sized except the scan itself.
  */
object Profile {

  /** Profile `cols` (numeric or castable-to-double) in one pass. Output:
    * one row per column — `(column, n, n_null, min, max, n_distinct)`,
    * min/max as double for a uniform schema. `n` counts ALL rows (shared
    * by every column); `n_distinct` is exact and excludes nulls.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(lit(1)).minus(count(col(c))).as(s"__nn_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row: one struct per column, then explode —
    // all engine-side, no driver round-trip
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__n_$c").as("n"), col(s"__nn_$c").as("n_null"),
        col(s"__mn_$c").as("min"), col(s"__mx_$c").as("max"),
        col(s"__nd_$c").as("n_distinct"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Fixed-range histogram of `value` over [lo, hi): `buckets` equal-width
    * bins plus underflow bin -1 and overflow bin `buckets`; nulls are
    * dropped. The bucket expression is pure IEEE arithmetic
    * (`floor((x - lo) * buckets / (hi - lo))`, clamped), so any engine
    * reproduces the exact same bin for every value — a fixed-range
    * histogram is also mergeable across data drops, which a
    * quantile-adaptive one is not.
    */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
      buckets: Int): DataFrame = {
    require(buckets > 0 && hi > lo, s"need buckets > 0 and hi > lo")
    val raw = floor((value - lit(lo)) * lit(buckets.toDouble) / lit(hi - lo))
    val bucket = when(value.isNull, lit(null))
      .when(raw < 0, lit(-1L))
      .when(raw >= buckets, lit(buckets.toLong))
      .otherwise(raw.cast("long"))
    df.where(value.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
