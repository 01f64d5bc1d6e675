package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style linear text classifier over hashed bag-of-words features —
  * the supervised quality-filter tier of a curation pipeline (CCNet / GPT-3 /
  * LLaMA all gate web text with exactly this shape: hash token features into
  * a fixed bucket space, score with a linear model, keep docs past a
  * threshold). Complements the heuristic [[TextOps.qualityScore]] and the
  * n-gram-LM [[LanguageModel.fitFilter]] tiers with a model TRAINED on
  * labeled in-corpus data.
  *
  * Training and scoring are INTEGER-EXACT by construction: the per-bucket
  * weight is the CLASS-BALANCED rate difference in fixed-point millionths —
  * w = (n_pos(b)·10^6 div T_pos) - (n_neg(b)·10^6 div T_neg), the integer
  * surrogate for p(b|pos) - p(b|neg) — so class-prior imbalance cannot push
  * every bucket to one sign (the naive +1/-1 instance weight degenerates to
  * all-negative whenever the negative class has more tokens). A doc's score
  * is the plain integer sum of its tokens' bucket weights. No floats
  * anywhere, so the full train+score pipeline replays bit-exact in the SQL
  * oracle (the same fixed-point trick the mixture and PageRank gates use).
  * Overflow bound: n_pos(b)·10^6 must fit a long — per-bucket class counts
  * up to ~9·10^12 are safe, far past any classifier training set (quality
  * classifiers train on ≤10^9 tokens; sample the training split, not the
  * corpus, if yours is bigger).
  *
  * Scale shape: training is one explode + ONE hash-aggregate keyed by
  * bucket (output is `buckets` rows — thousands, not vocabulary-sized);
  * scoring joins the broadcast weight table to the exploded token stream
  * and sums per doc (one aggregate shuffle on the doc id). Nothing is
  * pairwise; the weight table is fixed-size regardless of corpus size.
  */
object HashedClassifier {

  /** Deterministic feature hash shared with the oracle: bucket =
    * first-15-hex-digits of md5(token) as a long (non-negative, < 2^60)
    * mod `buckets` — DuckDB: `('0x' || substr(md5(tok),1,15))::BIGINT % B`.
    */
  def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % buckets

  /** Fixed-point scale for the balanced rates: millionths. */
  val RateScale: Long = 1000000L

  /** Train integer bucket weights from labeled docs: explode whitespace
    * tokens (instance counts, not distinct — frequency is signal), hash to
    * buckets, count per-class instances per bucket, then weight =
    * balanced millionths-rate difference (see object doc). The class
    * totals come from re-aggregating the 256-row bucket table itself — no
    * second pass over the corpus. `labelCol` is any boolean Column over
    * the input. Output: (bucket: long, w: long), at most `buckets` rows.
    */
  def train(docs: DataFrame, textCol: String, labelCol: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = docs.select(labelCol.as("__pos"),
        explode(split(col(textCol), " ")).as("__tok"))
      .groupBy(bucketOf(col("__tok"), buckets).as("bucket"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__nn"))
    val totals = counts.agg(sum(col("__np")).as("__tp"),
      sum(col("__nn")).as("__tn"))
    // `div` (not `/`): long integer division, truncating — identical to
    // DuckDB's `//` floor division because every operand is non-negative.
    // A single-class training set has one total at 0 (div -> NULL); that
    // class's rate term is defined as 0 so the op degrades to the other
    // class's rates instead of emitting NULL weights (and instead of
    // diverging from SQL engines that error on integer division by zero).
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (coalesce(expr(s"__np * $RateScale div nullif(__tp, 0)"), lit(0L)) -
          coalesce(expr(s"__nn * $RateScale div nullif(__tn, 0)"), lit(0L)))
          .as("w"))
  }

  /** Score docs with a trained weight table: score = integer sum of bucket
    * weights over the doc's token instances (unseen buckets contribute 0);
    * predicted = score > 0. Output: (idCol, score: long, predicted) —
    * ONE ROW PER INPUT DOC: a doc whose text is NULL still gets a row
    * with score 0 / predicted false rather than silently vanishing
    * (callers route keep/quarantine on `predicted`; a missing row would
    * be neither). The weight table is broadcast — it is `buckets`-bounded
    * by design.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int): DataFrame =
    // explode_outer (not explode): a NULL-text doc keeps one row with a
    // NULL token, whose NULL bucket matches no weight -> score 0 — one
    // output row per input doc with NO extra join or shuffle.
    docs.select(col(idCol), explode_outer(split(col(textCol), " ")).as("__tok"))
      .withColumn("bucket", bucketOf(col("__tok"), buckets))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w"), lit(0L))).as("score"))
      .withColumn("predicted", col("score") > 0)
}
