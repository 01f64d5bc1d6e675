package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the quality-filter family
  * production pipelines run over pretraining corpora (CCNet-style KenLM
  * perplexity filtering): train token-bigram statistics on a reference
  * corpus, score every document by how well its bigrams fit, drop the tail.
  *
  * Scale shape: training is one explode + one map-side-combined `groupBy`
  * (the count table is ~vocab², vastly smaller than the corpus); scoring is
  * one explode + one join against the count table (broadcast when it fits,
  * shuffle-hash otherwise — Spark picks by size) + one per-doc aggregate.
  * Nothing touches the driver; both stages are the standard 100 TB shapes.
  *
  * Two tiers, same seam:
  *  - [[scoreDocs]] — INTEGER-exact corpus-fit: per-doc sum/count of corpus
  *    bigram frequencies. Longs all the way; the final average is one IEEE
  *    division of two < 2^53 integers, so a SQL oracle reproduces it bit for
  *    bit. This is the cross-engine-gated tier.
  *  - [[logScoreDocs]] — add-k-smoothed log-probability (the literal
  *    KenLM-style formula). `ln` is not IEEE-pinned across engines, so this
  *    tier is spec-checked against a driver replay instead of the DuckDB
  *    gate (same policy as the float tail of sketch_stats).
  */
object LanguageModel {

  /** Bigram count table `(gram, gram_cnt)` from the corpus. */
  def trainBigrams(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.wordNGrams(col(textCol), 2)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("gram_cnt"))

  /** Unigram count table `(tok, tok_cnt)` (the smoothing denominator). */
  def trainUnigrams(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("tok_cnt"))

  /** Integer-exact corpus-fit score per document:
    * `(doc, n_bigrams, fit_sum, fit_avg)` where `fit_sum` is the sum of the
    * corpus-wide counts of the doc's bigrams and `fit_avg = fit_sum /
    * n_bigrams` (null for docs with < 2 tokens). Rare/garbled text scores
    * low, natural corpus-like text scores high — the same decision boundary
    * perplexity filtering draws, in exact arithmetic.
    *
    * The count-table join is LEFT: a bigram the training corpus has never
    * seen contributes 0 to `fit_sum` but still counts in `n_bigrams`, so a
    * new batch scored against an existing table (the incremental shape)
    * ranks all-garbage docs near 0 instead of returning them null-scored
    * as "unjudged". (Self-scoring is unaffected — every bigram matches by
    * construction.)
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      bigrams: DataFrame): DataFrame = {
    val perGram = docs
      .select(col(idCol), explode(TextOps.wordNGrams(col(textCol), 2)).as("gram"))
      .join(bigrams, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("gram_cnt"), lit(0L))).as("fit_sum"))
    // docs with < 2 tokens have no bigram rows — keep them, null-scored
    // (an inner join would silently drop them from the filter's view)
    docs.select(col(idCol)).distinct()
      .join(perGram, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("fit_sum"), lit(0L)).as("fit_sum"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(col("fit_sum").cast("double") / col("n_bigrams").cast("double"))
          .as("fit_avg"))
  }

  /** Add-k-smoothed mean log-probability per document (the production
    * perplexity formula): mean over bigrams (w1,w2) of
    * `ln((c(w1,w2) + k) / (c(w1) + k * vocab))`. Higher = more natural.
    * Spec-checked against a driver replay; see the class doc for why this
    * tier is not in the cross-engine gate.
    */
  def logScoreDocs(docs: DataFrame, idCol: String, textCol: String,
      bigrams: DataFrame, unigrams: DataFrame, vocabSize: Long,
      k: Double = 1.0): DataFrame = {
    val perGram = docs
      .select(col(idCol), explode(TextOps.wordNGrams(col(textCol), 2)).as("gram"))
      // the conditioning token is the gram's first token (tokens are
      // space-split, so they never contain a space themselves)
      .withColumn("tok", element_at(split(col("gram"), " ", 2), 1))
      .join(bigrams, Seq("gram"), "left")
      .join(unigrams, Seq("tok"), "left")
      .select(col(idCol),
        log((coalesce(col("gram_cnt"), lit(0L)) + k) /
          (coalesce(col("tok_cnt"), lit(0L)) + k * vocabSize)).as("lp"))
    perGram.groupBy(col(idCol))
      .agg(avg(col("lp")).as("mean_log_prob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** The filter itself: keep documents whose integer-exact fit average
    * clears `minFitAvg`. Null-scored docs (< 2 tokens) are dropped —
    * too short to judge is too short to train on.
    */
  def fitFilter(docs: DataFrame, idCol: String, textCol: String,
      bigrams: DataFrame, minFitAvg: Double): DataFrame = {
    val scores = scoreDocs(docs, idCol, textCol, bigrams)
      .where(col("fit_avg") >= minFitAvg)
      .select(col(idCol))
    docs.join(scores, Seq(idCol), "left_semi")
  }

  /** CCNet-style corpus-fit tertile bucketing: label every doc `head` /
    * `middle` / `tail` by where its fit score falls within its GROUP
    * (CCNet buckets per language on KenLM perplexity, then trains on head
    * +middle and usually drops tail). The per-doc metric is the
    * fixed-point fit average `fit_sum·10^6 div n_bigrams` (integer — the
    * same exact tier [[scoreDocs]] gates; zero-bigram docs score 0 and
    * land in `tail`); the per-group cutoffs are the exact interpolated
    * 1/3 and 2/3 percentiles of that integer metric, which both engines
    * compute from the identical `q·(n-1)` definition (the
    * `adaptive_filter` precedent). Output: (idCol, groupCol, fit1e6,
    * c33, c67, bucket) — the cutoffs ride along so any cross-engine
    * percentile drift is a visible hash break, not a silent label flip.
    *
    * Scale shape: scoring is the [[scoreDocs]] explode + count-join +
    * per-doc aggregate; the cutoff pass is ONE aggregate whose output is
    * #groups rows, broadcast back. The exact percentile buffers each
    * group's values ([[Percentiles]] exact tier) — fine for bounded
    * groups like languages at gate scale; at 100 TB swap the cutoff
    * aggregate for `Percentiles.approx` (bounded-memory GK sketch) and
    * accept rank-error-bounded cutoffs, or sample the cutoff pass as
    * CCNet itself does.
    */
  def fitBuckets(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, bigrams: DataFrame): DataFrame = {
    val fit = scoreDocs(docs, idCol, textCol, bigrams)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .withColumn("fit1e6",
        coalesce(expr("fit_sum * 1000000L div nullif(n_bigrams, 0L)"),
          lit(0L)))
      .select(col(idCol), col(groupCol), col("fit1e6"))
    val cuts = fit.groupBy(col(groupCol)).agg(
        expr(s"percentile(fit1e6, ${1.0 / 3})").as("c33"),
        expr(s"percentile(fit1e6, ${2.0 / 3})").as("c67"))
      .withColumnRenamed(groupCol, "__g")
    fit.join(broadcast(cuts), col(groupCol) <=> col("__g"))
      .withColumn("bucket",
        when(col("fit1e6") >= col("c67"), lit("head"))
          .when(col("fit1e6") >= col("c33"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(groupCol), col("fit1e6"),
        col("c33"), col("c67"), col("bucket"))
  }
}
