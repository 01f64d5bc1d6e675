package graft

import org.apache.spark.sql.{Column, DataFrame}

package object queries {
  /** Total-order output without RangePartitioner sampling. `orderBy` runs a
    * separate sampling pass over the sort's child, re-executing map-side
    * work (regex/md5 projections) a second time; for small ordered outputs
    * a single-partition sort computes the upstream exactly once. Use only
    * when the result comfortably fits one partition.
    */
  private[graft] def sortedSingle(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
