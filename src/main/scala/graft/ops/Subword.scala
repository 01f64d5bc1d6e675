package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WordPiece-family subword tokenization — the text → token-id step of the
  * reference's sentence-transformer embedder (cobalt-duckdb
  * model/search/vector.py:41-78 loads cl-nagoya/ruri-large, whose
  * tokenizer is a BERT WordPiece; the sandbox cannot fetch that vocab, so
  * the vocabulary here is INDUCED from the corpus — deterministically, so
  * a SQL oracle replays both induction and encoding exactly).
  *
  * Semantics follow BERT WordPiece greedy longest-match:
  *  - a word is matched left to right; at each position the LONGEST vocab
  *    piece wins, where word-initial positions match `is_cont = false`
  *    pieces and later positions match `is_cont = true` pieces (the `##`
  *    continuation distinction, carried as a flag column instead of a
  *    string prefix so pieces never collide with text that contains `##`);
  *  - if any position has no match, the WHOLE word becomes one `unkId`
  *    piece (`[UNK]` semantics);
  *  - the empty word encodes to zero pieces.
  *
  * Induction is frequency-based (top-`size` substrings of corpus words by
  * occurrence count) rather than likelihood-based BPE merges: same
  * greedy-decode contract, but expressible as one aggregate — and
  * therefore SQL-replayable, which puts the tokenizer under the hash gate
  * instead of behind a spec.
  *
  * Scale shape: induction counts DISTINCT words first (one
  * map-side-combined aggregate over the token explode), then explodes
  * substrings of the distinct-word table only — positions × pieceLens per
  * distinct word, never per occurrence. The top-`size` cut is
  * orderBy+limit (TakeOrderedAndProject: per-partition heaps). Encoding
  * broadcasts the collected vocab (model-artifact-sized, the PQ-codebook
  * class) into a per-row scan UDF — zero shuffle at any corpus size.
  */
object Subword {

  /** Greedy longest-match WordPiece ids for one word. Pure and shared by
    * the executor UDF and driver-side oracle-literal computation — the two
    * can never drift.
    *
    * @param vocab (piece, isContinuation) -> id
    */
  def greedyPieces(word: String, vocab: Map[(String, Boolean), Long],
      maxPieceLen: Int, unkId: Long): Seq[Long] = {
    if (word == null || word.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Long]
    var p = 0
    while (p < word.length) {
      var l = math.min(maxPieceLen, word.length - p)
      var hit = -1L
      var hitLen = 0
      while (l >= 1 && hit < 0) {
        vocab.get((word.substring(p, p + l), p > 0)) match {
          case Some(id) => hit = id; hitLen = l
          case None => l -= 1
        }
      }
      if (hit < 0) return Seq(unkId) // whole word -> [UNK]
      out += hit
      p += hitLen
    }
    out.result()
  }

  /** Induce `(piece, is_cont, piece_id, cnt)`: the top-`size` substrings
    * (length 1..`maxPieceLen`) of corpus words by total occurrence count,
    * ids dense from 0 in (cnt desc, piece asc, is_cont asc) order. A
    * substring occurrence is counted once per (word occurrence, start
    * position); `is_cont` records whether the start position is
    * word-internal.
    */
  def induce(docs: DataFrame, textCol: String, size: Int,
      maxPieceLen: Int = 4): DataFrame = {
    require(size > 0 && maxPieceLen > 0,
      s"need positive size/maxPieceLen: $size, $maxPieceLen")
    val wc = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("__c"))
    val subs = wc
      .select(col("word"), col("__c"),
        explode(sequence(lit(1), length(col("word")))).as("__s"))
      .select(col("word"), col("__c"), col("__s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .where(col("__s") + col("__l") - 1 <= length(col("word")))
      .select(col("word").substr(col("__s"), col("__l")).as("piece"),
        (col("__s") > 1).as("is_cont"), col("__c"))
      .groupBy(col("piece"), col("is_cont"))
      .agg(sum(col("__c")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc, col("is_cont").asc)
      .limit(size)
    // the window runs on <= size rows (already cut) — Vocab.induce's bound
    subs.withColumn("piece_id",
        row_number().over(Window.orderBy(
          col("cnt").desc, col("piece").asc, col("is_cont").asc)) - 1)
      .select(col("piece"), col("is_cont"),
        col("piece_id").cast("long").as("piece_id"), col("cnt"))
  }

  /** Driver-side pure twin of [[induce]] for SMALL fixture corpora (the
    * encoder gate's shared-constant recipe): same counting and ordering
    * semantics over an in-memory sentence list. Intended for
    * model-artifact-sized inputs only — it is not distributed. String
    * ordering is Java compareTo, which agrees with the engines' binary
    * UTF-8 order for BMP text (the fixtures avoid supplementary-plane
    * characters).
    */
  def induceLocal(texts: Seq[String], size: Int, maxPieceLen: Int = 4)
      : Map[(String, Boolean), Long] = {
    require(size > 0 && maxPieceLen > 0,
      s"need positive size/maxPieceLen: $size, $maxPieceLen")
    val wc = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(_.split(" ", -1).foreach { w =>
      wc.update(w, wc.getOrElse(w, 0L) + 1L)
    })
    val cnt = scala.collection.mutable.HashMap.empty[(String, Boolean), Long]
    wc.foreach { case (w, c) =>
      var s = 0
      while (s < w.length) {
        var l = 1
        while (l <= maxPieceLen && s + l <= w.length) {
          val key = (w.substring(s, s + l), s > 0)
          cnt.update(key, cnt.getOrElse(key, 0L) + c)
          l += 1
        }
        s += 1
      }
    }
    cnt.toSeq
      .sortBy { case ((piece, isCont), n) => (-n, piece, isCont) }
      .take(size).zipWithIndex
      .map { case (((piece, isCont), _), i) => (piece, isCont) -> i.toLong }
      .toMap
  }

  /** Collect an [[induce]]d vocabulary to the broadcastable driver-side
    * map [[greedyPieces]] consumes. Bounded by the induction `size` —
    * model-artifact class, never corpus-sized.
    */
  def collectVocab(vocab: DataFrame): Map[(String, Boolean), Long] =
    vocab.select(col("piece"), col("is_cont"), col("piece_id"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap

  /** Encode documents against an induced vocabulary: one row per piece,
    * `(idCol, wpos, k, piece_id)` — `wpos` the 0-based word position,
    * `k` the 0-based piece position within the word, `unkId` for
    * unmatched words. Per-row scan work only (broadcast vocab in the UDF
    * closure); no shuffle.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      vocab: Map[(String, Boolean), Long], maxPieceLen: Int = 4,
      unkId: Long = -1L): DataFrame = {
    val pieces = udf((word: String) =>
      greedyPieces(word, vocab, maxPieceLen, unkId))
    docs
      .select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("wpos", "word")))
      .select(col(idCol), col("wpos").cast("long").as("wpos"),
        posexplode(pieces(col("word"))).as(Seq("k", "piece_id")))
      .select(col(idCol), col("wpos"), col("k").cast("long").as("k"),
        col("piece_id"))
  }
}
