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

  /** UPSAMPLE each stratum to ~`epochs` passes over it — the other half of
    * mixture construction (LLaMA/Gopher-style recipes run a small
    * high-quality source for >1 epoch while the bulk web crawl runs <1).
    * Epochs are given in integer THOUSANDTHS (2500 = 2.5 epochs) so the
    * fraction arithmetic is exact on both engines: every row gets
    * `e1000 DIV 1000` copies, plus one more where its hash bucket falls
    * under `e1000 MOD 1000` of the 1000 buckets — so a 2.5-epoch stratum
    * is two full passes plus a deterministic half. e1000 < 1000
    * downsamples (0 copies for rows above the fraction), so one operator
    * expresses the whole mixture weight line.
    *
    * Scale shape: ONE scan — the epoch spec is a broadcast map join, the
    * copy fan-out is a map-side `explode(sequence(...))` (no shuffle),
    * and the emitted `epochCopyCol` (0-based copy index) keeps replicated
    * rows distinct for downstream shuffles/dedup. Deterministic under
    * retry/speculation/engine swap (same [[Sampling.hashBucket]] contract
    * as [[toTokenBudget]]).
    */
  def epochReplicate(df: DataFrame, stratum: Column, key: Column,
      epochs1000: Map[String, Long], default1000: Long = 1000L,
      epochCopyCol: String = "epoch_copy"): DataFrame = {
    require(default1000 >= 0 && epochs1000.values.forall(_ >= 0),
      "epoch thousandths must be >= 0")
    val spec = epochs1000.toSeq.flatMap { case (s, e) => Seq(lit(s), lit(e)) }
    val e1000 =
      if (spec.isEmpty) lit(default1000)
      else coalesce(element_at(map(spec: _*), stratum.cast("string")),
        lit(default1000))
    // integer floor-division spelled shuffle-free and float-free: the
    // numerator is made an exact multiple of 1000 before the divide
    val e = e1000.cast("long")
    val rem = pmod(e, lit(1000L))
    val nCopies = ((e - rem) / lit(1000L)).cast("long") +
      when(Sampling.hashBucket(key, 1000) < rem, 1L).otherwise(0L)
    df.withColumn("__n", nCopies)
      .where(col("__n") > 0)
      .withColumn(epochCopyCol,
        explode(sequence(lit(0L), col("__n") - 1L)))
      .drop("__n")
  }

  /** Temperature-balanced mixture shares at alpha = 1/2 — the multilingual
    * "temperature sampling" recipe (mT5 / UniMax / XLM-R): stratum i's
    * share of the budget is proportional to sqrt(size_i), flattening the
    * head sources without drowning the tail the way uniform shares would.
    *
    * Engine-exact despite the sqrt: IEEE-754 sqrt is correctly rounded in
    * every engine (JVM Math.sqrt == libm == DuckDB), so
    * `floor(sqrt(tot))` is bit-identical cross-engine, and everything
    * after it is integer fixed-point (parts-per-million floor division —
    * the same trick as [[toTokenBudget]]). Other temperatures don't get
    * this guarantee (`pow` is not correctly rounded); alpha = 1/2 is the
    * standard choice and the one this engine gates.
    *
    * Output, one row per stratum: (stratum, tot, w = floor(sqrt(tot)),
    * ppm = w·10^6 div sum(w), alloc = budget·ppm div 10^6). One aggregate
    * over the corpus + one re-aggregate of the strata table (strata are
    * source/language-bounded — never corpus-sized).
    */
  def temperatureShares(df: DataFrame, stratum: Column, sizeCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val t = df.groupBy(stratum.as("stratum")).agg(sum(sizeCol).as("tot"))
      .withColumn("w", floor(sqrt(col("tot").cast("double"))).cast("long"))
    // nullif guards: a corpus where every stratum weight is 0 (all-empty
    // strata) makes __sw = 0; under Spark 4's ANSI mode a bare integer
    // `div` would throw DIVIDE_BY_ZERO at runtime instead of degrading.
    // Define the share of a weightless corpus as 0 — the same guard
    // HashedClassifier.train uses for a single-class training set.
    t.crossJoin(broadcast(t.agg(sum(col("w")).as("__sw"))))
      .select(col("stratum"), col("tot"), col("w"),
        coalesce(expr("w * 1000000 div nullif(__sw, 0)"), lit(0L)).as("ppm"),
        coalesce(expr(s"$budget * (w * 1000000 div nullif(__sw, 0)) div 1000000"),
          lit(0L)).as("alloc"))
  }

  /** Apply [[temperatureShares]] as a deterministic sample: stratum i
    * keeps `least(buckets, buckets·alloc_i div tot_i)` of its hash
    * buckets — the same stable hash-bucket filter as [[toTokenBudget]],
    * with the per-stratum target coming from the temperature shares
    * instead of a flat cap. One scan + a broadcast share join.
    */
  def sampleTemperature(df: DataFrame, stratum: Column, key: Column,
      sizeCol: Column, budget: Long, buckets: Int = 1000): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    // nullif: `tot` is a per-stratum sum of caller sizes — 0 (or a 0-sum
    // stratum) must degrade to keeping nothing, not throw ANSI
    // DIVIDE_BY_ZERO (same guard as temperatureShares' __sw).
    val shares = temperatureShares(df, stratum, sizeCol, budget)
      .select(col("stratum"),
        least(lit(buckets.toLong),
          coalesce(expr(s"$buckets * alloc div nullif(tot, 0)"), lit(0L)))
          .as("__keep"))
    df.join(broadcast(shares), stratum <=> col("stratum"))
      .where(Sampling.hashBucket(key, buckets) < col("__keep"))
      .drop("stratum", "__keep")
  }
}
