package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns.
  *
  * At 100 TB the embedding column IS the table: float32→int8 cuts scan,
  * shuffle, and cache volume 4× at a ~1% cosine-ranking cost, which is why
  * every production vector store ships it. Cosine similarity is
  * scale-invariant, so quantized cosine needs only the integer codes —
  * the per-vector scale matters only when reconstructing dot products or
  * L2 distances.
  *
  * All arithmetic is column expressions evaluated engine-side (never
  * driver-side math), so a DuckDB oracle replicates it bit-for-bit: both
  * engines compute `round(x * 127/max|x|)` in IEEE double with half-away-
  * from-zero rounding.
  */
object Quantize {

  /** 127/max(|v|) — the per-vector quantization scale (1.0 for an all-zero
    * vector, which quantizes to all zeros anyway).
    */
  def scaleOf(vec: Column): Column = {
    val mx = array_max(transform(vec, v => abs(v)))
    when(mx > 0, lit(127.0) / mx).otherwise(lit(1.0))
  }

  /** Integer codes in [-127, 127] (int storage here; at rest cast to
    * tinyint/byte for the full 4× shrink). Backed by the codegen'd
    * [[graft.functions.Int8Codes]]: a `transform` lambda would inline the
    * scale subexpression and re-derive max|x| per ELEMENT — O(dim²) work
    * plus an allocation per element (measured 6× the whole query's budget
    * at sf0.1).
    */
  def codes(vec: Column): Column = graft.functions.array_int8_codes(vec)

  /** Driver-side twin of [[codes]] for a single local vector (e.g. a query
    * vector that will be inlined as a literal — one row never justifies a
    * Spark job). Bit-identical to the engine path: same max|x| scale and the
    * same half-away-from-zero rounding Spark's `round` applies to doubles
    * (BigDecimal HALF_UP, which DuckDB's `round` also matches). Non-finite
    * elements are excluded from the scale and code to None, matching the
    * engine expression's null element.
    */
  def codesLocal(vec: Array[Double]): Seq[Option[Int]] = {
    var mx = 0.0
    vec.foreach(x => if (java.lang.Double.isFinite(x)) mx = math.max(mx, math.abs(x)))
    val s = if (mx > 0) 127.0 / mx else 1.0
    vec.toSeq.map(x =>
      if (java.lang.Double.isFinite(x))
        Some(java.math.BigDecimal.valueOf(x * s)
          .setScale(0, java.math.RoundingMode.HALF_UP).intValue)
      else None)
  }

  /** Integer dot product of two code arrays (exact in long). Higher-order
    * functions are fine for the occasional reconstruction below; the hot
    * scan loop is [[cosineDistance]], which compiles via a native
    * expression instead.
    */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine distance from integer codes alone (scales cancel). NULL when
    * either vector quantized to all zeros. Backed by the codegen'd
    * [[graft.functions.Int8CosineDistance]] — the quantized brute-force
    * scan stays inside whole-stage codegen with long accumulators.
    */
  def cosineDistance(qa: Column, qb: Column): Column =
    graft.functions.array_int8_cosine_distance(qa, qb)

  /** Reconstructed float dot product: intDot/(scale_a·scale_b). */
  def dotReconstructed(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    intDot(qa, qb).cast("double") / (sa * sb)
}
