package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): rank a
  * large raw corpus by how target-like each document's hashed n-gram
  * distribution is, then keep the top of the ranking. This is the
  * distribution-MATCHING selection tier — it complements the supervised
  * [[HashedClassifier]] (which needs labels) and the heuristic
  * [[TextOps.qualityScore]] (which needs rules): here the "label" is just a
  * small sample of the distribution you want more of (e.g. curated books +
  * wiki), and everything else is counting.
  *
  * Integer-exact adaptation (the same fixed-point discipline as
  * [[HashedClassifier]] / the mixture gates, so the full fit+score pipeline
  * replays bit-exact in a SQL oracle):
  *  - features = word unigrams + bigrams per INSTANCE (the paper's hashed
  *    n-gram features), hashed into `buckets` cells with the shared md5
  *    scheme ([[HashedClassifier.bucketOf]]);
  *  - per side (target / raw), the add-one-smoothed bucket rate in
  *    millionths: rate(b) = (n(b)+1)·10^6 div (T+B) — integer, bounded by
  *    10^6 since n(b) <= T;
  *  - per-bucket importance weight: w(b) = rate_t(b)·10^6 div
  *    max(rate_r(b), 1) — the fixed-point probability RATIO p_t(b)/p_r(b).
  *    (The paper scores with Σ c_b·log w(b); `ln` is not correctly-rounded
  *    across engines, so the gated contract sums the linearized ratio
  *    weights instead — same ordering signal for near-1 ratios, exactly
  *    reproducible everywhere. The max(,1) guard covers rates that floor
  *    to 0 when T+B > 10^6·(n+1).)
  *  - doc score = the AVERAGE w(bucket) over the doc's feature instances
  *    (integer division — see [[scoreDocs]]), ONE ROW PER INPUT DOC
  *    (NULL-text docs score 0).
  *
  * Overflow bounds: rate <= 10^6, so w <= 10^12; the pre-average sum of a
  * 10^5-feature doc is <= 10^17 — long-safe; (n(b)+1)·10^6 requires
  * per-bucket counts <= ~9·10^12, far past any fit sample (fit on samples,
  * as the paper does).
  *
  * Scale shape: each fit side is one explode + ONE hash-aggregate keyed by
  * bucket (output = `buckets` rows); the weight table is built over the
  * full bucket range (B rows, broadcast); scoring joins the broadcast
  * weights to the exploded corpus and sums per doc — one aggregate shuffle
  * keyed by doc id, nothing pairwise, weight table fixed-size regardless of
  * corpus size. Selection is a top-n (TakeOrderedAndProject — never a
  * global single-partition window).
  */
object Dsir {

  /** Fixed-point scale: millionths (shared with the oracle replay). */
  val Scale: Long = HashedClassifier.RateScale

  /** Hashed-n-gram feature list of a text column: word unigrams + bigrams,
    * per instance. NULL text yields an empty list (the doc still scores,
    * at 0).
    */
  def features(textCol: Column): Column =
    when(textCol.isNull, array().cast("array<string>"))
      .otherwise(concat(TextOps.tokens(textCol), TextOps.wordNGrams(textCol, 2)))

  /** Per-bucket feature-instance counts of one fit side: (bucket, n),
    * at most `buckets` rows (only buckets that occur — the weight builder
    * re-densifies over the full range).
    */
  def bucketCounts(sample: DataFrame, textCol: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    sample.select(explode(features(textCol)).as("__f"))
      .groupBy(HashedClassifier.bucketOf(col("__f"), buckets).as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Fit the importance-weight table from a target sample and a raw sample:
    * (bucket, w) over the FULL bucket range [0, buckets) — every scored
    * feature finds a weight, including buckets unseen in either sample
    * (which get the smoothed default ratio). Both inputs should be samples,
    * not the whole corpus: the signal is distributional.
    */
  def importanceWeights(target: DataFrame, targetTextCol: Column,
      raw: DataFrame, rawTextCol: Column, buckets: Int): DataFrame = {
    val tc = bucketCounts(target, targetTextCol, buckets)
    val rc = bucketCounts(raw, rawTextCol, buckets)
    val totals = broadcast(
      tc.agg(coalesce(sum(col("n")), lit(0L)).as("__tt")).crossJoin(
        rc.agg(coalesce(sum(col("n")), lit(0L)).as("__tr"))))
    target.sparkSession.range(buckets).toDF("bucket")
      .join(broadcast(tc.withColumnRenamed("n", "__nt")), Seq("bucket"), "left")
      .join(broadcast(rc.withColumnRenamed("n", "__nr")), Seq("bucket"), "left")
      .crossJoin(totals)
      .select(col("bucket"),
        expr(s"((coalesce(__nt, 0L) + 1L) * ${Scale}L div (__tt + $buckets)) " +
          s"* ${Scale}L div greatest((coalesce(__nr, 0L) + 1L) * ${Scale}L " +
          s"div (__tr + $buckets), 1L)").as("w"))
  }

  /** Importance score per doc: the AVERAGE weight per feature instance,
    * (Σ w(bucket(feature))) div max(#features, 1) — length-normalized, so
    * a long off-target doc cannot out-accumulate a short target-like one
    * (the raw sum is length-biased; the paper's log-weight sum normalizes
    * only implicitly, and its per-token mean is the standard reporting
    * form). Output (idCol, score: long) — one row per input doc
    * (explode_outer keeps NULL-text docs at score 0, as
    * [[HashedClassifier.score]] does). `weights` is broadcast — it is
    * `buckets`-bounded by construction.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: Column,
      weights: DataFrame, buckets: Int): DataFrame =
    docs.select(col(idCol), explode_outer(features(textCol)).as("__f"))
      .withColumn("bucket", HashedClassifier.bucketOf(col("__f"), buckets))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(expr("sum(coalesce(w, 0L)) div greatest(count(__f), 1L)")
        .as("score"))

  /** Deterministic selection: the n most target-like docs by
    * (score desc, id asc) — a TakeOrderedAndProject cut, the engine-safe
    * stand-in for the paper's Gumbel resampling (which needs per-row
    * randomness the deterministic gate can't carry). For sampled rather
    * than top selection, compose the score with [[Sampling]] instead.
    */
  def selectTop(scored: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    scored.orderBy(col("score").desc, col(idCol).asc).limit(n)
  }

  /** Quantization of the seeded-Gumbel draw: the per-doc uniform is the
    * 60-bit md5 convention mod this many levels.
    */
  val GumbelBuckets: Int = 1024

  /** Fixed-point Gumbel quantile table: entry b holds
    * round(10⁶ · −ln(−ln((b+0.5)/N))) — the standard-Gumbel quantile at
    * the b-th mid-bucket uniform, in micro-units. Computed ONCE here with
    * StrictMath (platform-pinned) and embedded as a literal in BOTH the
    * Spark plan and the SQL oracle, so query time is pure integer
    * arithmetic — no engine evaluates a transcendental, and no libm
    * rounding difference can change a draw. Range ≈ [−2.03·10⁶, 7.62·10⁶].
    */
  lazy val gumbelTableMicro: Seq[Long] =
    (0 until GumbelBuckets).map { b =>
      val u = (b + 0.5) / GumbelBuckets
      math.round(-StrictMath.log(-StrictMath.log(u)) * Scale)
    }

  /** Seeded Gumbel-top-n selection — the paper's ACTUAL resampling step
    * (draw docs with probability ∝ exp(score/τ)) made deterministic and
    * engine-exact via the Gumbel-top-k identity: add standard-Gumbel noise
    * to score/τ and take the n largest. Per-doc noise is
    * [[gumbelTableMicro]] indexed by md5("seed|id") mod [[GumbelBuckets]];
    * the integer key is score·10⁶ + τ·g_micro (≡ score/τ + g up to the
    * positive factor τ·10⁶), top-n by (key desc, id asc). τ is in score
    * units: larger τ → noisier, more exploratory draw; τ=0 degrades to
    * [[selectTop]] with a hash tie-break. Seeded: a retry, a re-run, or
    * another engine draws the SAME sample.
    *
    * Scale shape: one codegen'd per-row projection (md5 + a literal-array
    * lookup — no join, no transcendental) over the scored frame, then a
    * TakeOrderedAndProject cut: identical cost class to [[selectTop]] at
    * any corpus size. Overflow: |score|·10⁶ ≤ 10¹⁸ needs |score| ≤ 10¹²
    * (true by the weight bound above); τ·g ≤ τ·7.7·10⁶ — keep τ under
    * ~10¹⁰.
    *
    * Output: (idCol, score, gkey) — gkey rides along so the oracle gate
    * pins the draw arithmetic itself, not just the chosen set.
    */
  def selectGumbelTop(scored: DataFrame, idCol: String, n: Int,
      seed: Long, tau: Long): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(tau >= 0, s"tau must be non-negative, got $tau")
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"$seed|"), col(idCol).cast("string"))),
        1, 15), 16, 10).cast("long"),
      lit(GumbelBuckets.toLong))
    scored
      .withColumn("gkey",
        col("score") * lit(Scale) + lit(tau) *
          element_at(typedLit(gumbelTableMicro), (bucket + lit(1L)).cast("int")))
      .orderBy(col("gkey").desc, col(idCol).asc)
      .limit(n)
  }
}
