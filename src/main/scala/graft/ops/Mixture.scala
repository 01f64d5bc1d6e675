package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset mixture to a token budget — the sampling step that turns a raw
  * corpus into a training mixture ("cap every language/source at N tokens").
  *
  * The per-stratum keep fraction is DERIVED FROM THE DATA (one tiny
  * aggregate: #strata rows), then applied as a deterministic hash-bucket
  * filter ([[Sampling.hashBucket]]) via a broadcast join — so the whole
  * operator is one scan + one scalar-sized shuffle, no driver collect, and
  * the sample is stable under task retry / speculative execution / engine
  * swap. All threshold arithmetic is integer (floor division), so an
  * external engine replays it bit-exactly.
  */
object Mixture {

  /** Downsample each stratum to ~`targetTokens` tokens: stratum s keeps
    * `min(buckets, buckets * targetTokens DIV tokens_s)` of `buckets` hash
    * buckets (i.e. fraction min(1, target/tokens_s), floored to 1/buckets
    * granularity). Strata under budget are kept whole.
    */
  def toTokenBudget(df: DataFrame, stratum: Column, key: Column,
      tokens: Column, targetTokens: Long, buckets: Int = 1000): DataFrame = {
    require(buckets > 0 && targetTokens >= 0,
      s"need buckets > 0 and targetTokens >= 0: $buckets / $targetTokens")
    val num = buckets.toLong * targetTokens
    val keep = df.groupBy(stratum.as("__s"))
      .agg(sum(tokens).as("__tot"))
      .select(col("__s"),
        least(lit(buckets.toLong), expr(s"${num}L DIV __tot")).as("__keep"))
    // null-safe join: a null stratum is a stratum (groupBy already treats
    // it as one group) — a plain === would silently DROP every null-stratum
    // row from the mixture, a data-loss footgun at corpus scale
    df.join(broadcast(keep), stratum <=> col("__s"))
      .where(Sampling.hashBucket(key, buckets) < col("__keep"))
      .drop("__s", "__keep")
  }
}
