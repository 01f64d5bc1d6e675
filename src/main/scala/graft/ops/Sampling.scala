package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-replicable sampling for corpus pipelines.
  *
  * `rand()`-based sampling is useless at 100 TB: task retries and
  * speculative execution re-roll the dice, so a failed stage changes the
  * sample. Hash sampling decides membership from the row's own key —
  * reproducible across runs, engines, and partial re-executions, and any
  * two disjoint bucket ranges give disjoint splits (train/holdout from one
  * pass, no coordination).
  *
  * The hash is the same 60-bit md5 prefix convention as the dedup tiers
  * (`Dedup.minhashSignatures`), so every split is replicable as a DuckDB
  * oracle; swap in xxhash64 at production scale if oracle parity is not
  * needed.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the md5 of the key column. */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))
  }

  /** Keep rows whose bucket falls in [lo, hi) of [0, buckets) — a
    * deterministic (hi-lo)/buckets fraction. Disjoint [lo, hi) ranges give
    * disjoint samples of the same frame; lo == hi is a legal empty range
    * (the boundary of a split-ratio sweep), not an error.
    */
  def sampleRange(df: DataFrame, key: Column, buckets: Int,
      lo: Int, hi: Int): DataFrame = {
    require(0 <= lo && lo <= hi && hi <= buckets,
      s"need 0 <= lo <= hi <= buckets, got [$lo, $hi) of $buckets")
    val b = hashBucket(key, buckets)
    df.where(b >= lo && b < hi)
  }

  /** Deterministic corpus shuffle: a total order from the key's md5 — the
    * training-order randomization step, without `rand()`'s retry problem
    * (a re-run, a task retry, or another engine produces the SAME order).
    * Sorting by a hash is a full range-shuffle like any global sort;
    * pipelines that only need per-partition mixing can
    * `repartitionByRange` on the same key and skip the final sort.
    */
  def shuffled(df: DataFrame, key: Column): DataFrame =
    df.orderBy(md5(key.cast("string")).asc, key.asc)

  /** Train/holdout split in one pass: (bucket < trainBuckets, the rest). */
  def trainHoldout(df: DataFrame, key: Column, buckets: Int,
      trainBuckets: Int): (DataFrame, DataFrame) = (
    sampleRange(df, key, buckets, 0, trainBuckets),
    sampleRange(df, key, buckets, trainBuckets, buckets))

  /** Stratified sample: a different keep-fraction per stratum — the
    * training-data MIXTURE operator (e.g. upsample low-resource languages,
    * downsample crawl boilerplate). `fractions` maps stratum value ->
    * buckets kept out of `buckets`; strata not listed keep `defaultKeep`.
    * Still one scan-side filter, no shuffle, deterministic per row key:
    * the stratum only selects the threshold the row's hash bucket is
    * compared against.
    */
  def stratified(df: DataFrame, stratum: Column, key: Column, buckets: Int,
      fractions: Map[String, Int], defaultKeep: Int = 0): DataFrame = {
    require((fractions.values ++ Seq(defaultKeep)).forall(k => k >= 0 && k <= buckets),
      s"every keep-count must be in [0, $buckets]: $fractions / $defaultKeep")
    val b = hashBucket(key, buckets)
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultKeep)) {
      case (acc, (value, keep)) => when(stratum === lit(value), lit(keep)).otherwise(acc)
    }
    df.where(b < threshold)
  }

  /** EXACTLY k rows per stratum (fewer if the stratum is smaller) — the
    * eval-set / few-shot-pool construction step, where a fractional sample
    * can't promise per-group counts. Deterministic: rows rank within their
    * stratum by (md5(key), key) — a retry, re-run, or another engine picks
    * the SAME k. Precondition (as with [[hashSample]]): `key` must be unique
    * per row — duplicate keys sort as ties, and row_number breaks ties
    * arbitrarily, which forfeits the determinism this function exists for.
    * The window partitions by stratum, so no global sort and no
    * single-task window; a hot stratum costs one partition's sort of that
    * stratum only (k is not a skew lever — the sort is over the stratum
    * either way; salt the stratum first if one group alone exceeds a task).
    */
  def kPerGroup(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")).asc, key.asc)
    df.withColumn("__graft_rank", row_number().over(w))
      .where(col("__graft_rank") <= k)
      .drop("__graft_rank")
  }

  /** Per-group ADAPTIVE quantile filter — RefinedWeb/CCNet-style curation
    * where the cutoff is derived from each group's own distribution (a fixed
    * global threshold over- or under-filters whichever domains differ from
    * the corpus average): keep rows whose `metric` is >= their group's
    * exact `q`-quantile. The appended `cutoff` column makes the decision
    * auditable downstream.
    *
    * Exact (interpolating) percentile, not approx: both Spark's
    * `percentile` and DuckDB's `quantile_cont` compute the same
    * index = q·(n-1) linear interpolation over the sorted values, so on
    * integer metrics the cutoff is engine-exact (the midpoint of two longs
    * is exactly representable) and this op can sit under the hash gate.
    *
    * Scale shape: one aggregate keyed by group (groups = sources/domains —
    * thousands at most; the per-group exact percentile sorts only that
    * group's metric values inside the aggregate buffer), then a broadcast
    * join back. The corpus is scanned twice but never shuffled on the row
    * key. For metrics with billions of rows per group, swap in
    * `percentile_approx` at the call site — the shape is identical.
    */
  def adaptiveQuantileFilter(df: DataFrame, groupCol: Column, metric: Column,
      q: Double): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0, 1), got $q")
    val cuts = df.groupBy(groupCol.as("__grp"))
      .agg(percentile(metric, lit(q)).as("cutoff"))
    df.join(broadcast(cuts), groupCol === col("__grp"))
      .where(metric.cast("double") >= col("cutoff"))
      .drop("__grp")
  }
}
