package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary induction and token-id encoding — the step between raw text
  * and a training tensor: pick the top-`size` tokens by corpus frequency,
  * assign dense ids, encode every document against the vocabulary with an
  * out-of-vocabulary id for the tail.
  *
  * Scale shape: counting is one explode + map-side-combined `groupBy`; the
  * top-`size` cut is `orderBy(...).limit(size)` — Spark plans it as
  * TakeOrderedAndProject (per-partition heaps, no global sort of the count
  * table). Id assignment windows over the ALREADY-CUT `size`-row frame, so
  * the single-partition window everyone fears never sees more than `size`
  * rows (a vocab is 10^4-10^6 — driver-trivial, never corpus-sized).
  * Encoding is a broadcast join of the vocab into the exploded corpus: at
  * 100 TB the corpus side streams map-side, nothing shuffles.
  *
  * Ordering is fully pinned — count desc, then token asc — so ids are
  * deterministic and a SQL oracle reproduces them exactly.
  */
object Vocab {

  /** Induce `(token, token_id, tok_cnt)`: top-`size` tokens by
    * (count desc, token asc), ids dense from 0 in that order.
    */
  def induce(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"vocab size must be positive, got $size")
    val counts = docs
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tok_cnt"))
      .orderBy(col("tok_cnt").desc, col("token").asc)
      .limit(size)
    // the window runs on <= size rows (already cut) — bounded by design
    counts.withColumn("token_id",
        row_number().over(
          Window.orderBy(col("tok_cnt").desc, col("token").asc)) - 1)
      .select(col("token"), col("token_id").cast("long").as("token_id"),
        col("tok_cnt"))
  }

  /** Encode documents against an induced vocabulary: one output row per
    * token position, `(idCol, pos, token_id)` with 0-based positions and
    * `oovId` for tokens outside the vocabulary. The exploded long format is
    * the join/inspection-friendly shape; pack to arrays with
    * [[encodePacked]] when a tensor-like row per doc is wanted.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, oovId: Long = -1L): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(oovId)).as("token_id"))

  /** One row per document, ids packed into an array in token order
    * (`(idCol, token_ids)`): the exploded encode regrouped by doc. The
    * regroup shuffles only (id, pos, token_id) longs — a fraction of the
    * text bytes already shuffled anywhere near this step — and the array
    * order is rebuilt from `pos`, not from shuffle arrival order
    * (`sort_array` over (pos, id) structs, then project the id), so the
    * packing is deterministic.
    */
  def encodePacked(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, oovId: Long = -1L): DataFrame =
    encode(docs, idCol, textCol, vocab, oovId)
      .groupBy(col(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("token_id")))),
        e => e.getField("token_id")).as("token_ids"))
}
