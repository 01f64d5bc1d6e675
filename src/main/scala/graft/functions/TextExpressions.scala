package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.graftshim.SparkShims.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash over a token array (near-duplicate fingerprinting for the
  * LLM-pipeline dedup surface — north star; no analogue in the reference,
  * which only does exact-vector search).
  *
  * Definition (pinned so a DuckDB-1.0 oracle can replicate it relationally):
  * token hash h = first 15 hex chars of md5(token) parsed base-16 (60 bits);
  * for each bit b in 0..59 sum votes (+1 if bit set, -1 otherwise) over all
  * tokens; result bit b is 1 iff the vote sum >= 0. Empty/NULL-element-free
  * arrays of zero length hash to 0. NULL array -> NULL.
  *
  * md5 (not xxhash) keeps the oracle expressible; at 100 TB swap in a
  * xxhash64-based variant — the banding/bucketing machinery is hash-agnostic.
  * CodegenFallback is acceptable: per-token md5 dominates cost, not boxing.
  */
case class SimHash(child: Expression) extends UnaryExpression with ExpectsInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    var used = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        used += 1
        val tok = arr.getUTF8String(i).toString
        md.reset()
        val d = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        // first 15 hex chars == high 60 bits of the first 8 digest bytes
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = h >>> 4 // keep the leading 15 nibbles (60 bits)
        var b = 0
        while (b < 60) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0 && used > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word n-grams ("shingles") over a token array — the hot loop of every
  * shingle-based pipeline (Jaccard joins, MinHash, components, funnel,
  * decontamination). The higher-order-function encoding it replaces
  * (`transform(sequence(...), i -> concat_ws(" ", slice(t, i+1, n)))`)
  * stays interpreted and allocates a sliced array per gram; this compiles
  * into the stage and builds each gram with one `UTF8String.concatWs`
  * (which skips nulls — exact parity with `concat_ws`). Arrays shorter
  * than n yield an empty array; NULL arrays follow standard null-safe
  * semantics (callers that need empty-for-null coalesce it).
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNGrams.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Occurrence count of the most frequent element: sort a copy, take the
  * longest equal-adjacent run. Replaces the interpreted
  * `aggregate(array_sort(...), struct-accumulator)` encoding behind
  * `TextOps.topNGramCount` — the Gopher repetition numerator — with one
  * compiled call that also absorbs the ArraySort node. Empty array -> 0;
  * NULL array -> NULL (null-safe). Null elements sort together and count
  * as equal (parity with the `<=>` comparison it replaces).
  */
case class MaxEqualRun(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "max_equal_run"

  override def nullSafeEval(v: Any): Any =
    MaxEqualRun.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MaxEqualRun.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MaxEqualRun {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) =>
      if (x eq y) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.compareTo(y))
    var best = 1L; var run = 1L
    i = 1
    while (i < n) {
      val eq = (a(i) == null && a(i - 1) == null) ||
        (a(i) != null && a(i).equals(a(i - 1)))
      run = if (eq) run + 1L else 1L
      if (run > best) best = run
      i += 1
    }
    best
  }
}

/** NON-OVERLAPPING n-token chunks of a token array, space-joined — the
  * segment constructor of [[graft.ops.Dedup.segmentDedup]] (C4-style
  * fixed-window segments; [[WordNGrams]] is the OVERLAPPING sibling). The
  * tail chunk keeps the remaining < n tokens. The HOF encoding it replaces
  * (`transform(sequence(...), i -> concat_ws(" ", slice(t, i*n+1, n)))`)
  * stays interpreted and allocates a slice per segment. Empty array ->
  * empty array; NULL array -> NULL (null-safe); null elements are skipped
  * by concatWs (parity with concat_ws).
  */
case class WordChunks(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_chunks: n must be >= 1, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_chunks"

  override def nullSafeEval(v: Any): Any =
    WordChunks.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordChunks.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordChunks {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val nSegs = (sz + n - 1) / n
    val out = new Array[Any](nSegs)
    var i = 0
    while (i < nSegs) {
      val start = i * n
      val len = math.min(n, sz - start)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        parts(j) = if (arr.isNullAt(start + j)) null
          else arr.getUTF8String(start + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Sliding-window minimum over a long array — the winnowing selection step
  * ([[graft.ops.Dedup.winnowFingerprints]]): out(i) = min(arr(i..i+w-1)),
  * length max(n-w+1, 0). The HOF encoding it replaces
  * (`transform(sequence(...), i -> array_min(slice(arr, i, w)))`) stays
  * interpreted and allocates a sliced array per window; this compiles into
  * the stage and runs the O(n) monotonic-deque algorithm (amortized one
  * push/pop per element, no per-window allocation). NULL elements are
  * treated as absent from their windows (parity with `list_min`/`array_min`
  * null-skipping); a window with no non-null values yields Long.MaxValue —
  * unreachable from the shingle-hash producer, but pinned for determinism.
  * NULL array -> NULL (null-safe).
  */
case class WindowMin(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window_min: w must be >= 1, got $w")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "window_min"

  override def nullSafeEval(v: Any): Any =
    WindowMin.compute(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowMin.compute($c, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WindowMin {
  /** Shared by interpreted eval and generated code. Monotonic deque of
    * candidate indices, values strictly increasing front→back, so the
    * front is always the current window's minimum; null slots never enter
    * the deque.
    */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    val deque = new Array[Int](n) // candidate indices, values increasing
    var head = 0; var tail = 0    // [head, tail)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
        deque(tail) = i; tail += 1
      }
      if (head < tail && deque(head) <= i - w) head += 1
      if (i >= w - 1)
        out(i - w + 1) =
          if (head < tail) arr.getLong(deque(head)) else Long.MaxValue
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Unicode NFC normalization — the canonicalization step of corpus text
  * cleaning (decomposed e + U+0301 and precomposed é must dedup, tokenize,
  * and fingerprint identically). Spark has no built-in; this wraps the
  * JDK's `java.text.Normalizer` (the same Unicode NFC DuckDB exposes as
  * `nfc_normalize`, so the oracle replicates it directly). Codegen'd; the
  * already-normalized fast path (the overwhelming majority of real text)
  * allocates nothing beyond the isNormalized scan.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
