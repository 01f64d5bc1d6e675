package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: lay the corpus out as one concatenated token
  * stream (in `idCol` order) and assign every document its global token
  * offset and the training-sequence bins it lands in.
  *
  * The naive encoding — `sum(tokens) OVER (ORDER BY id)` with no partition —
  * is the classic scale trap: Spark moves the ENTIRE corpus through one
  * task (WindowExec warns about it). This implementation is the scalable
  * prefix-sum: range-partition by id, per-partition running totals (window
  * WITH a partition key — parallel), per-partition sums prefix-summed over
  * a frame of only `partitions` rows (that window is single-partition but
  * partition-COUNT sized, not corpus-sized), broadcast the offsets back.
  * Two scans of the input, no global sort, no driver collect. The result is
  * invariant to where the range boundaries fall, so range-sampling
  * nondeterminism cannot change the output.
  */
object Packing {

  /** (idCol, n_tokens, start_offset, first_bin, last_bin) per document.
    * Zero-token documents occupy no bin; they report `first_bin ==
    * last_bin` at their offset's bin for a stable schema.
    */
  def sequenceOffsets(df: DataFrame, idCol: String, tokens: Column,
      binSize: Int, partitions: Int = 0): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    val base = df.repartitionByRange(p, col(idCol))
      .select(col(idCol), tokens.cast("long").as("n_tokens"),
        spark_partition_id().as("__pid"))
    val localW = Window.partitionBy("__pid").orderBy(col(idCol))
    val localCum = base.withColumn("__local_end", sum(col("n_tokens")).over(localW))
    val prefixW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__pid").agg(sum("n_tokens").as("__psum"))
      .withColumn("__offset", coalesce(sum(col("__psum")).over(prefixW), lit(0L)))
      .select("__pid", "__offset")
    localCum.join(broadcast(offsets), "__pid")
      .withColumn("start_offset",
        col("__offset") + col("__local_end") - col("n_tokens"))
      .withColumn("first_bin", expr(s"start_offset DIV $binSize"))
      .withColumn("last_bin",
        greatest(col("first_bin"),
          expr(s"(start_offset + n_tokens - 1) DIV $binSize")))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        col("first_bin"), col("last_bin"))
  }

  /** Assemble the training stream itself: route every encoded token to its
    * `(seq_id, pos_in_seq)` slot from the document's global
    * [[sequenceOffsets]] offset — the last step of text → tensor, with
    * documents crossing sequence boundaries exactly as GPT-style packing
    * wants. `encoded` is the exploded `(idCol, pos, token_id)` form
    * ([[Vocab.encode]]); `offsets` is [[sequenceOffsets]]' output for the
    * SAME documents and ordering. The join is doc-keyed (both sides hash-
    * partition on `idCol`) and everything after is pure integer arithmetic
    * in the projection — no window, no sort, no skew lever beyond the join
    * itself.
    */
  def packTokens(encoded: DataFrame, idCol: String, binSize: Int,
      offsets: DataFrame): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    encoded
      .join(offsets.select(col(idCol), col("start_offset")), Seq(idCol))
      .withColumn("__gpos", col("start_offset") + col("pos"))
      .select(
        expr(s"__gpos DIV $binSize").as("seq_id"),
        pmod(col("__gpos"), lit(binSize.toLong)).as("pos_in_seq"),
        col("token_id"))
  }
}
