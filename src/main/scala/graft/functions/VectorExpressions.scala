package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.SparkShims
import org.apache.spark.sql.graftshim.SparkShims.AbstractDataType
import org.apache.spark.sql.types._

/** Runtime errors shared by interpreted + generated code paths. */
object VectorErrors {
  /** Dimension-mismatch error with DuckDB cast-error parity
    * (reference: model/search/vector.py:176 casts `::DOUBLE[n]`; DuckDB raises
    * "Cannot cast list with length L to array with length N" on mismatch).
    */
  def dimMismatch(l: Int, r: Int): RuntimeException =
    new IllegalArgumentException(
      s"Cannot compute vector operation: dimension mismatch ($l vs $r); " +
        s"mirrors DuckDB 'Cannot cast list with length $l to array with length $r'")
}

/** Base for binary vector->double expressions over array<float|double>.
  *
  * Mirrors the reference's single SQL surface
  * `array_cosine_distance(embedding::DOUBLE[1024], <query>::DOUBLE[1024])`
  * (reference: model/search/vector.py:173-180): float32 embeddings widen to
  * double (reference widens via .tolist() at vector.py:134 and casts to DOUBLE
  * at vector.py:176), all accumulation is in double, dimension mismatch raises.
  *
  * Designed for whole-stage codegen: `doGenCode` emits a tight primitive loop
  * over `ArrayData` with no boxing — this is the hot path of the brute-force
  * scan, executed once per (row x query) at 100 TB scale.
  */
trait VectorBinaryOp extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(
    SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Fold (dot, normA, normB) into the scalar result (interpreted path). */
  protected def finish(dot: Double, na: Double, nb: Double): Double

  /** Java source computing the result from accumulators (codegen path). */
  protected def finishCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw VectorErrors.dimMismatch(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val lf = leftIsFloat; val rf = rightIsFloat
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    finish(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (leftIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
               else (a: String, i: String) => s"$a.getDouble($i)"
    val getR = if (rightIsFloat) (b: String, i: String) => s"(double) $b.getFloat($i)"
               else (b: String, i: String) => s"$b.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  throw graft.functions.VectorErrors.dimMismatch($n, $b.numElements());
        |}
        |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  final double $x = ${getL(a, i)};
        |  final double $y = ${getR(b, i)};
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |if (!${ev.isNull}) {
        |  ${ev.value} = ${finishCode(dot, na, nb)};
        |}
      """.stripMargin
    })
  }
}

/** `array_cosine_distance(a, b)` = 1 - cos_sim; zero vector -> 2.0 and NULL -> NULL,
  * pinned to the DuckDB 1.0 oracle (`1 - array_cosine_similarity`, similarity of a
  * zero vector = -1.0 — verified locally; see repo FIXTURES.md §C).
  */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "array_cosine_distance"
  // Similarity is clamped to [-1, 1] before 1-x: float drift can push the
  // ratio one ULP past 1 (self-similarity), and the DuckDB 1.0 oracle clamps
  // (verified: self-similarity returns exactly 1.0, not 1.0000000000000002).
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    if (na == 0.0 || nb == 0.0) 2.0
    else 1.0 - math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  override protected def finishCode(dot: String, na: String, nb: String): String =
    s"(($na == 0.0 || $nb == 0.0) ? 2.0 : 1.0 - java.lang.Math.max(-1.0, " +
      s"java.lang.Math.min(1.0, $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)))))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `array_cosine_similarity(a, b)`; zero vector -> -1.0 (DuckDB 1.0 parity). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "array_cosine_similarity"
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    if (na == 0.0 || nb == 0.0) -1.0
    else math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  override protected def finishCode(dot: String, na: String, nb: String): String =
    s"(($na == 0.0 || $nb == 0.0) ? -1.0 : java.lang.Math.max(-1.0, " +
      s"java.lang.Math.min(1.0, $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)))))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `array_inner_product(a, b)` — plain dot product in double. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryOp {
  override def prettyName: String = "array_inner_product"
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `array_distance(a, b)` — Euclidean (L2) distance in double. */
case class L2Distance(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(
    SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_distance"

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw VectorErrors.dimMismatch(n, b.numElements())
    var acc = 0.0
    var i = 0
    val lf = leftIsFloat; val rf = rightIsFloat
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (leftIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
               else (a: String, i: String) => s"$a.getDouble($i)"
    val getR = if (rightIsFloat) (b: String, i: String) => s"(double) $b.getFloat($i)"
               else (b: String, i: String) => s"$b.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  throw graft.functions.VectorErrors.dimMismatch($n, $b.numElements());
        |}
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  final double $d = ${getL(a, i)} - ${getR(b, i)};
        |  $acc += $d * $d;
        |}
        |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($acc); }
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `array_int8_codes(v)` — symmetric per-vector int8 quantization codes:
  * `round(x * 127/max|x|)` (half away from zero, exactly Spark `round` /
  * DuckDB `round` semantics via BigDecimal), all-zero vectors pass through
  * as all-zero codes. ONE pass over the array computes the scale, a second
  * emits the codes — the higher-order-function encoding this replaces
  * (`transform(v, x -> round(x * scaleOf(v)))`) inlines the scale
  * subexpression into the per-element lambda and re-derives max|x| for
  * EVERY element: O(dim^2) traversals plus an allocation per element
  * (measured 0.65 s for 2000x64 at sf0.1; this expression: one job floor).
  */
case class Int8Codes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "array_int8_codes"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    Int8Codes.compute(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Codes.compute($c, $isFloat)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Int8Codes {
  /** Shared by interpreted eval and generated code (one static call per row
    * keeps the operator inside the whole-stage-codegen span).
    */
  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        // non-finite elements don't participate in the scale and code to
        // null below (BigDecimal.valueOf throws on NaN/Inf; Inf as the max
        // would collapse every finite code to 0)
        if (java.lang.Double.isFinite(x)) {
          val ax = math.abs(x)
          if (ax > mx) mx = ax
        }
      }
      i += 1
    }
    val s = if (mx > 0) 127.0 / mx else 1.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        if (java.lang.Double.isFinite(x)) {
          out(i) = java.math.BigDecimal.valueOf(x * s)
            .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `array_int8_cosine_distance(a, b)` — cosine distance over quantized
  * integer code arrays (graft.ops.Quantize): dot and norms accumulate
  * EXACTLY in long (int8 codes can't overflow: 2^53 headroom holds to
  * ~5·10^8 dims), then one double division. NULL when either vector
  * quantized to all zeros. This is the hot loop of a quantized brute-force
  * scan — a higher-order-function encoding (zip_with + aggregate) stays
  * interpreted and allocates per row; this compiles into the stage.
  */
case class Int8CosineDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_int8_cosine_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw VectorErrors.dimMismatch(n, b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getInt(i).toLong
      val y = b.getInt(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom > 0) 1.0 - dot.toDouble / denom else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  throw graft.functions.VectorErrors.dimMismatch($n, $b.numElements());
        |}
        |long $dot = 0L; long $na = 0L; long $nb = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  final long $x = (long) $a.getInt($i);
        |  final long $y = (long) $b.getInt($i);
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |if (!${ev.isNull}) {
        |  final double $denom = java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb);
        |  if ($denom > 0) { ${ev.value} = 1.0 - ((double) $dot) / $denom; }
        |  else { ${ev.isNull} = true; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `array_l2_norm(a)` — Euclidean norm in double. */
case class L2Norm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_l2_norm"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    val f = isFloat
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
              else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      s"""
        |final int $n = $a.numElements();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  final double $x = ${get(a, i)};
        |  $acc += $x * $x;
        |}
        |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($acc); }
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `cosine_argmin(v, cids, cvecs)` — the candidate id minimizing
  * `(array_cosine_distance(v, cvec), cid)`: a whole bucket's assignment
  * argmin as ONE codegen'd expression over index-aligned candidate arrays.
  *
  * This is the scalable middle ground between the two shapes that fail at
  * bucketed-assignment scale: `min(struct(d, cid))` after an explosion
  * join falls to SortAggregate over candidate-many wide rows (measured:
  * 4× the exact build), and `array_min(transform(...))` is a higher-order
  * function — CodegenFallback, interpreted per element (measured: just as
  * bad). Here the candidate loop runs inside whole-stage codegen with no
  * boxing, no row explosion, and no aggregate at all.
  *
  * Distance semantics are EXACTLY [[CosineDistance]] (zero vector → 2.0,
  * similarity clamped); ties break to the lowest cid — the
  * `min(struct(d, cid))` ordering. NaN distances are never selected
  * (NaN-largest, matching struct-min); if every candidate is NaN the
  * result is NULL. NULL vector/array/element → NULL. The two candidate
  * arrays must be index-aligned and equal-length (built by two
  * `collect_list`s in one aggregate — same row stream, same order).
  */
case class CosineArgmin(vec: Expression, ids: Expression, vecs: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def first: Expression = vec
  override def second: Expression = ids
  override def third: Expression = vecs
  override def prettyName: String = "cosine_argmin"

  override def inputTypes: Seq[AbstractDataType] = Seq(
    SparkShims.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    ArrayType(LongType),
    SparkShims.typeCollection(ArrayType(ArrayType(FloatType)),
      ArrayType(ArrayType(DoubleType))))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def candIsFloat: Boolean =
    vecs.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, cidsAny: Any, cvecsAny: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val cids = cidsAny.asInstanceOf[ArrayData]
    val cvecs = cvecsAny.asInstanceOf[ArrayData]
    val m = cids.numElements()
    if (m != cvecs.numElements()) throw new IllegalArgumentException(
      s"cosine_argmin: ${m} ids vs ${cvecs.numElements()} vectors")
    val n = a.numElements()
    val vf = vecIsFloat; val cf = candIsFloat
    var found = false
    var bestD = 0.0
    var bestId = 0L
    var j = 0
    while (j < m) {
      if (cids.isNullAt(j) || cvecs.isNullAt(j)) return null
      val cv = cvecs.getArray(j)
      if (cv.numElements() != n) throw VectorErrors.dimMismatch(n, cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || cv.isNullAt(i)) return null
        val x = if (vf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (cf) cv.getFloat(i).toDouble else cv.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val d = if (na == 0.0 || nb == 0.0) 2.0
        else 1.0 - math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
      val cid = cids.getLong(j)
      // d == d skips NaN candidates (NaN-largest, struct-min ordering);
      // an all-NaN candidate set leaves found=false → NULL.
      if (d == d && (!found || d < bestD || (d == bestD && cid < bestId))) {
        found = true; bestD = d; bestId = cid
      }
      j += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getV = if (vecIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
               else (a: String, i: String) => s"$a.getDouble($i)"
    val getC = if (candIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
               else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, cids, cvecs) => {
      val m = ctx.freshName("m"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val cv = ctx.freshName("cv"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val cid = ctx.freshName("cid")
      val found = ctx.freshName("found"); val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      s"""
        |final int $m = $cids.numElements();
        |if ($m != $cvecs.numElements()) {
        |  throw new IllegalArgumentException(
        |    "cosine_argmin: " + $m + " ids vs " + $cvecs.numElements() + " vectors");
        |}
        |final int $n = $a.numElements();
        |boolean $found = false;
        |double $bestD = 0.0;
        |long $bestId = 0L;
        |for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
        |  if ($cids.isNullAt($j) || $cvecs.isNullAt($j)) { ${ev.isNull} = true; break; }
        |  final org.apache.spark.sql.catalyst.util.ArrayData $cv = $cvecs.getArray($j);
        |  if ($cv.numElements() != $n) {
        |    throw graft.functions.VectorErrors.dimMismatch($n, $cv.numElements());
        |  }
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $cv.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final double $x = ${getV(a, i)};
        |    final double $y = ${getC(cv, i)};
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  if (${ev.isNull}) break;
        |  final double $d = ($na == 0.0 || $nb == 0.0) ? 2.0
        |    : 1.0 - java.lang.Math.max(-1.0, java.lang.Math.min(1.0,
        |        $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))));
        |  final long $cid = $cids.getLong($j);
        |  if ($d == $d && (!$found || $d < $bestD || ($d == $bestD && $cid < $bestId))) {
        |    $found = true; $bestD = $d; $bestId = $cid;
        |  }
        |}
        |if (!${ev.isNull}) {
        |  if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(vec = f, ids = s, vecs = t)
}
