package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.util.Hashing.splitmix64

/** ONNX attention subset — the step past [[MlpEmbedder]]: a real
  * transformer ENCODER STACK (L chained blocks, single- or multi-head,
  * optional learned positional embeddings) executes from a genuine
  * `.onnx` protobuf, through the same once-per-JVM [[ModelRegistry]]
  * lifecycle as every other model artifact. The reference's embedder is a full
  * sentence-transformer (cobalt-duckdb model/search/vector.py:41-78); this
  * closes the architecture family down to "real pretrained weights", which
  * a zero-egress sandbox cannot fetch.
  *
  * Unlike [[OnnxLinearModel.parseMlp]]'s sequential chain, this is a NAMED
  * DATAFLOW executor: nodes read/write a value environment keyed by tensor
  * name (ONNX requires topological node order, so file order is execution
  * order), which is what attention needs — Q/K/V branch from one input,
  * residual adds join values from non-adjacent nodes. The executable op
  * set is {Gather, Gemm(transB), MatMul, Transpose, Add, Mul, Div,
  * Softmax, Relu, Tanh, Sigmoid, Erf, LayerNormalization, ReduceMean}
  * over 2-D float tensors — enough for `ids → Gather(E) [+ Gather(P,
  * positions) — learned positional embeddings, runtime-fed positions
  * input] → [Q=XWq K=XWk V=XWv → softmax(QKᵀ/√d)V → Wo → +residual →
  * LayerNorm → FFN(Relu | Tanh | decomposed Gelu) → +residual →
  * LayerNorm] → mean-pool`.
  * Anything outside the set fails loudly. All arithmetic is float32 with a
  * fixed accumulation order, `StrictMath.exp` in softmax — bit-identical
  * across JVMs and spec-replayable.
  *
  * The writer emits the canonical encoder-block fixture (opset 17 for
  * LayerNormalization, graph IO declared: `ids: INT64[seq]` with a
  * symbolic batch dim, `y: FLOAT[1, d]`), deterministic bytes — the
  * checked-in `tiny_attention.onnx` is byte-reproducible from its seed.
  */
object OnnxTransformer {

  import OnnxLinearModel.{Reader, Writer, Tensor, parseTensor, floatTensor,
    intAttr, valueInfo}

  // ---- tensors ----------------------------------------------------------

  /** Row-major 2-D float tensor (scalars are 1×1, vectors 1×n). */
  final case class Mat(rows: Int, cols: Int, a: Array[Float]) {
    require(a.length == rows * cols, s"mat ${a.length} != $rows x $cols")
    @inline def apply(r: Int, c: Int): Float = a(r * cols + c)
  }

  private def toMat(t: Tensor): Mat = t.dims.length match {
    case 2 => Mat(t.dims(0).toInt, t.dims(1).toInt, t.floats)
    case 1 => Mat(1, t.dims(0).toInt, t.floats)
    case 0 =>
      require(t.floats.length == 1, s"onnx: 0-dim tensor '${t.name}' with ${t.floats.length} floats")
      Mat(1, 1, t.floats)
    case n => throw new IllegalArgumentException(
      s"onnx: ${n}-D tensor '${t.name}' outside the 2-D executor subset")
  }

  // ---- model ------------------------------------------------------------

  final case class Node(op: String, inputs: Seq[String], outputs: Seq[String],
      attrF: Map[String, Float], attrI: Map[String, Long],
      attrInts: Map[String, Seq[Long]])

  /** A parsed executable graph: initializers (float Mats plus INT64 shape
    * tensors — Reshape/Expand/Unsqueeze-13 read their shapes from these),
    * topologically ordered nodes, the INT64 graph inputs — token ids, plus
    * an optional positions input (fed `0..n-1` at run time — the
    * positional-embedding Gather) and an optional ATTENTION-MASK input
    * (fed all-ones by default — the standard sentence-transformer export
    * declares one even though a batch-1 embedder never pads; padded runs
    * feed a real 0/1 mask) — and the declared output. Inputs classify
    * structurally: an extra input consumed as Gather indices is positions,
    * any other extra input is the mask.
    */
  final case class GraphModel(inits: Map[String, Mat],
      intInits: Map[String, Array[Long]], nodes: Seq[Node],
      inputName: String, posInputName: Option[String],
      maskInputName: Option[String],
      outputName: String, outputDim: Int) {
    /** Vocabulary = row count of the table the TOKEN-id Gather reads. */
    val vocab: Int = nodes
      .find(n => n.op == "Gather" && n.inputs.lift(1).contains(inputName))
      .flatMap(n => inits.get(n.inputs.head)).map(_.rows)
      .getOrElse(throw new IllegalArgumentException(
        "onnx: no Gather(initializer, ids) — not a token-embedding graph"))

    /** Max sequence length = positional-table rows (unbounded if none). */
    val seqLimit: Int = posInputName.flatMap(p => nodes
        .find(n => n.op == "Gather" && n.inputs.lift(1).contains(p))
        .flatMap(n => inits.get(n.inputs.head)).map(_.rows))
      .getOrElse(Int.MaxValue)

    /** Execute the graph on one token-id sequence (float32 throughout),
      * with the attention mask defaulted to all-ones — the batch-1 no-pad
      * case every Embedder here runs.
      */
    def run(ids: Array[Int]): Array[Float] = run(ids, null)

    /** Execute with an explicit 0/1 attention mask (length = ids.length) —
      * the padded-batch contract a standard exporter compiles in: masked
      * keys get the additive -10^4 before softmax, masked rows drop out of
      * the masked mean-pool.
      */
    def run(ids: Array[Int], mask: Array[Float]): Array[Float] = {
      require(ids.nonEmpty, "onnx: empty id sequence")
      require(ids.length <= seqLimit,
        s"onnx: ${ids.length} tokens exceed the positional table ($seqLimit rows)")
      require(mask == null || mask.length == ids.length,
        s"onnx: mask length ${if (mask == null) -1 else mask.length} != ${ids.length}")
      val env = scala.collection.mutable.HashMap.empty[String, Mat]
      // Tensor names whose values are derived ONLY from the 0/1 attention
      // mask (through constants/initializers) — the one place an exporter's
      // int-target Cast is a true identity on the stored float payload.
      // Propagated per node: every non-initializer input mask-derived →
      // output mask-derived (so `scores + madd` correctly leaves the set).
      val maskDerived = scala.collection.mutable.HashSet.empty[String]
      maskInputName.foreach { mn =>
        val m = if (mask != null) mask else Array.fill(ids.length)(1f)
        env(mn) = Mat(1, ids.length, m.clone())
        maskDerived += mn
      }
      def in(node: Node, i: Int): Mat = {
        val n = node.inputs(i)
        env.getOrElse(n, inits.getOrElse(n,
          throw new IllegalArgumentException(s"onnx: ${node.op} input '$n' undefined")))
      }
      /** INT64 shape operand (Reshape/Expand/Unsqueeze-13 second input). */
      def shapeIn(node: Node, i: Int): Array[Long] =
        intInits.getOrElse(node.inputs(i),
          throw new IllegalArgumentException(
            s"onnx: ${node.op} shape input '${node.inputs(i)}' must be an INT64 initializer"))
      /** Collapse an ONNX target shape to the 2-D executor world: resolve
        * one -1 from the element count, then require at most two non-1
        * dims (real exporters' [1,1,n,m]-style shapes collapse cleanly).
        */
      def collapse2D(shape: Array[Long], n: Int, op: String): (Int, Int) = {
        val known = shape.filter(_ != -1L).product
        val resolved: Array[Int] = shape.map(d => if (d == -1L) {
          require(known > 0 && n % known == 0, s"onnx: $op cannot infer -1 in ${shape.mkString("[", ",", "]")} for $n elems")
          (n / known).toInt
        } else d.toInt)
        val real = resolved.filter(_ != 1)
        require(real.length <= 2,
          s"onnx: $op shape ${shape.mkString("[", ",", "]")} has >2 non-1 dims — outside the 2-D executor")
        val (r, c) = real.length match {
          case 0 => (1, 1)
          case 1 =>
            // a single real dim: row vector unless the trailing dims are
            // all 1 (… ,k,1] → column vector)
            if (resolved.nonEmpty && resolved.last == 1 && real.head != 1)
              (real.head, 1) else (1, real.head)
          case _ => (real(0), real(1))
        }
        require(r * c == n, s"onnx: $op shape ${shape.mkString("[", ",", "]")} != $n elems")
        (r, c)
      }
      nodes.foreach { node =>
        val out: Mat = node.op match {
          case "Gather" =>
            val table = inits.getOrElse(node.inputs.head,
              throw new IllegalArgumentException(
                s"onnx: Gather table '${node.inputs.head}' must be an initializer"))
            val idxName = node.inputs(1)
            val indices: Array[Int] =
              if (idxName == inputName) ids
              else if (posInputName.contains(idxName)) Array.tabulate(ids.length)(identity)
              else throw new IllegalArgumentException(
                s"onnx: Gather indices '$idxName' is not a graph input")
            require(node.attrI.getOrElse("axis", 0L) == 0L, "onnx: Gather axis != 0")
            val out = new Array[Float](indices.length * table.cols)
            var r = 0
            while (r < indices.length) {
              val id = indices(r)
              require(id >= 0 && id < table.rows, s"onnx: id $id outside table ${table.rows}")
              System.arraycopy(table.a, id * table.cols, out, r * table.cols, table.cols)
              r += 1
            }
            Mat(indices.length, table.cols, out)
          case "Gemm" =>
            require(node.attrI.getOrElse("transA", 0L) == 0L, "onnx: Gemm transA unsupported")
            require(node.attrF.getOrElse("alpha", 1f) == 1f &&
              node.attrF.getOrElse("beta", 1f) == 1f, "onnx: Gemm alpha/beta != 1")
            val transB = node.attrI.getOrElse("transB", 0L) == 1L
            val bias = if (node.inputs.length >= 3) Some(in(node, 2)) else None
            gemm(in(node, 0), in(node, 1), transB, bias)
          case "MatMul" => gemm(in(node, 0), in(node, 1), transB = false, None)
          case "Transpose" =>
            val perm = node.attrInts.getOrElse("perm", Seq(1L, 0L))
            require(perm == Seq(1L, 0L), s"onnx: Transpose perm $perm != [1,0]")
            val x = in(node, 0)
            val out = new Array[Float](x.a.length)
            var r = 0
            while (r < x.rows) {
              var c = 0
              while (c < x.cols) { out(c * x.rows + r) = x(r, c); c += 1 }
              r += 1
            }
            Mat(x.cols, x.rows, out)
          case "Add" =>
            broadcastBinary(node.op, in(node, 0), in(node, 1))(_ + _)
          case "Div" =>
            val x = in(node, 0); val s = in(node, 1)
            require(s.rows == 1 && s.cols == 1, "onnx: Div divisor must be scalar")
            val d = s.a(0)
            val out = new Array[Float](x.a.length)
            var i = 0
            while (i < out.length) { out(i) = x.a(i) / d; i += 1 }
            Mat(x.rows, x.cols, out)
          case "Softmax" =>
            val axis = node.attrI.getOrElse("axis", -1L)
            require(axis == -1L || axis == 1L, s"onnx: Softmax axis $axis != last")
            val x = in(node, 0)
            val out = new Array[Float](x.a.length)
            var r = 0
            while (r < x.rows) {
              var m = Float.NegativeInfinity
              var c = 0
              while (c < x.cols) { if (x(r, c) > m) m = x(r, c); c += 1 }
              var sum = 0f
              c = 0
              while (c < x.cols) {
                val e = StrictMath.exp((x(r, c) - m).toDouble).toFloat
                out(r * x.cols + c) = e
                sum += e
                c += 1
              }
              c = 0
              while (c < x.cols) { out(r * x.cols + c) /= sum; c += 1 }
              r += 1
            }
            Mat(x.rows, x.cols, out)
          case "Relu" =>
            val x = in(node, 0)
            val out = new Array[Float](x.a.length)
            var i = 0
            while (i < out.length) { out(i) = if (x.a(i) < 0f) 0f else x.a(i); i += 1 }
            Mat(x.rows, x.cols, out)
          case "Tanh" =>
            elementwise(in(node, 0))(v => StrictMath.tanh(v.toDouble).toFloat)
          case "Sigmoid" =>
            elementwise(in(node, 0))(v =>
              (1.0 / (1.0 + StrictMath.exp(-v.toDouble))).toFloat)
          case "Erf" =>
            elementwise(in(node, 0))(v => erfAS(v.toDouble).toFloat)
          case "Mul" =>
            broadcastBinary(node.op, in(node, 0), in(node, 1))(_ * _)
          case "Sub" =>
            broadcastBinary(node.op, in(node, 0), in(node, 1))(_ - _)
          case "Cast" =>
            // all runtime values are float32 here, so Cast to=1 (float) is
            // an identity on the stored payload. Int/bool targets (6/7/9)
            // are identities ONLY on the 0/1 mask chain (maskDerived) —
            // the form real exporters emit; off-chain they would need
            // trunc/floor semantics, and value-changing targets (e.g.
            // to=10 float16 rounding) are never emitted by the supported
            // export shapes. Everything else fails loudly like any other
            // out-of-subset op.
            val to = node.attrI.getOrElse("to", 1L)
            val onMask = node.inputs.headOption.exists(maskDerived)
            require(to == 1L || (onMask && Set(6L, 7L, 9L)(to)),
              s"onnx: Cast to=$to${if (onMask) " (mask chain)" else ""} " +
                "outside the executor subset")
            in(node, 0)
          case "Unsqueeze" | "Squeeze" =>
            // 2-D executor: inserting/removing size-1 dims never changes
            // the row-major payload, and every downstream op here consumes
            // the collapsed 2-D view — identity. (opset 13+ passes axes as
            // an input; <13 as an attribute; both are shape bookkeeping.)
            in(node, 0)
          case "Reshape" =>
            val x = in(node, 0)
            val (r2, c2) = collapse2D(shapeIn(node, 1), x.a.length, "Reshape")
            Mat(r2, c2, x.a)
          case "Expand" =>
            val x = in(node, 0)
            val shape = shapeIn(node, 1)
            require(shape.forall(_ > 0L), s"onnx: Expand shape must be static")
            val real = shape.filter(_ != 1).map(_.toInt)
            require(real.length <= 2,
              "onnx: Expand shape has >2 non-1 dims — outside the 2-D executor")
            val (tr, tc) = real.length match {
              case 0 => (1, 1)
              case 1 => if (shape.last == 1L) (real.head, 1) else (1, real.head)
              case _ => (real(0), real(1))
            }
            require((tr == x.rows || x.rows == 1) && (tc == x.cols || x.cols == 1),
              s"onnx: Expand ${x.rows}x${x.cols} -> ${tr}x$tc not broadcastable")
            val out = new Array[Float](tr * tc)
            var r = 0
            while (r < tr) {
              var c = 0
              while (c < tc) {
                out(r * tc + c) = x(if (x.rows == 1) 0 else r, if (x.cols == 1) 0 else c)
                c += 1
              }
              r += 1
            }
            Mat(tr, tc, out)
          case "ReduceSum" =>
            // axes from the <13 attribute or the 13+ INT64 input; last-dim
            // (per-row) and first-dim (per-column) reductions cover the
            // exporter's masked-pooling shapes (mask count, pooled sums)
            val axes: Seq[Long] = node.attrInts.get("axes")
              .orElse(if (node.inputs.length >= 2) Some(shapeIn(node, 1).toSeq) else None)
              .getOrElse(Seq(-1L))
            require(axes.length == 1, s"onnx: ReduceSum multi-axis $axes unsupported")
            val x = in(node, 0)
            axes.head match {
              case -1L | 1L =>
                val out = new Array[Float](x.rows)
                var r = 0
                while (r < x.rows) {
                  var sum = 0f
                  var c = 0
                  while (c < x.cols) { sum += x(r, c); c += 1 }
                  out(r) = sum
                  r += 1
                }
                Mat(x.rows, 1, out)
              case 0L =>
                val out = new Array[Float](x.cols)
                var c = 0
                while (c < x.cols) {
                  var sum = 0f
                  var r = 0
                  while (r < x.rows) { sum += x(r, c); r += 1 }
                  out(c) = sum
                  c += 1
                }
                Mat(1, x.cols, out)
              case a => throw new IllegalArgumentException(
                s"onnx: ReduceSum axis $a outside {0, 1, -1}")
            }
          case "Concat" =>
            require(node.attrI.getOrElse("axis", 0L) == 1L, "onnx: Concat axis != 1")
            val parts = node.inputs.indices.map(in(node, _))
            require(parts.forall(_.rows == parts.head.rows),
              "onnx: Concat row counts differ")
            val cols = parts.map(_.cols).sum
            val out = new Array[Float](parts.head.rows * cols)
            var r = 0
            while (r < parts.head.rows) {
              var off = 0
              parts.foreach { p =>
                System.arraycopy(p.a, r * p.cols, out, r * cols + off, p.cols)
                off += p.cols
              }
              r += 1
            }
            Mat(parts.head.rows, cols, out)
          case "LayerNormalization" =>
            val axis = node.attrI.getOrElse("axis", -1L)
            require(axis == -1L || axis == 1L, s"onnx: LayerNormalization axis $axis != last")
            val eps = node.attrF.getOrElse("epsilon", 1e-5f)
            val x = in(node, 0); val g = in(node, 1); val b = in(node, 2)
            require(g.a.length == x.cols && b.a.length == x.cols,
              "onnx: LayerNormalization scale/bias length != cols")
            val out = new Array[Float](x.a.length)
            var r = 0
            while (r < x.rows) {
              var sum = 0f
              var c = 0
              while (c < x.cols) { sum += x(r, c); c += 1 }
              val mean = sum / x.cols
              var varSum = 0f
              c = 0
              while (c < x.cols) {
                val d = x(r, c) - mean
                varSum += d * d
                c += 1
              }
              val inv = (1.0 / Math.sqrt((varSum / x.cols + eps).toDouble)).toFloat
              c = 0
              while (c < x.cols) {
                out(r * x.cols + c) = (x(r, c) - mean) * inv * g.a(c) + b.a(c)
                c += 1
              }
              r += 1
            }
            Mat(x.rows, x.cols, out)
          case "ReduceMean" =>
            require(node.attrInts.getOrElse("axes", Seq(0L)) == Seq(0L),
              "onnx: ReduceMean axes != [0]")
            val x = in(node, 0)
            val out = new Array[Float](x.cols)
            var c = 0
            while (c < x.cols) {
              var sum = 0f
              var r = 0
              while (r < x.rows) { sum += x(r, c); r += 1 }
              out(c) = sum / x.rows
              c += 1
            }
            Mat(1, x.cols, out)
          case op => throw new IllegalArgumentException(
            s"onnx: op '$op' outside the attention executor subset")
        }
        env(node.outputs.head) = out
        val dataIns = node.inputs.filter(n =>
          !inits.contains(n) && !intInits.contains(n))
        if (dataIns.nonEmpty && dataIns.forall(maskDerived)) {
          maskDerived += node.outputs.head
        }
      }
      val y = env.getOrElse(outputName,
        throw new IllegalArgumentException(s"onnx: graph output '$outputName' never produced"))
      require(y.rows == 1 && y.cols == outputDim,
        s"onnx: output ${y.rows}x${y.cols} != declared 1x$outputDim")
      y.a
    }
  }

  /** Elementwise unary op, row-major order preserved. */
  private def elementwise(x: Mat)(f: Float => Float): Mat = {
    val out = new Array[Float](x.a.length)
    var i = 0
    while (i < out.length) { out(i) = f(x.a(i)); i += 1 }
    Mat(x.rows, x.cols, out)
  }

  /** Elementwise binary op with the exporter-standard broadcasts: same
    * shape, scalar (1x1) operand on either side, or row (1xC) second
    * operand. A non-commutative op (Sub) keeps argument order — only the
    * SHAPE broadcasts, never the operand roles.
    */
  private def broadcastBinary(op: String, x: Mat, y: Mat)
      (f: (Float, Float) => Float): Mat = {
    if (x.rows == y.rows && x.cols == y.cols) {
      val out = new Array[Float](x.a.length)
      var i = 0
      while (i < out.length) { out(i) = f(x.a(i), y.a(i)); i += 1 }
      Mat(x.rows, x.cols, out)
    } else if (y.rows == 1 && y.cols == 1) { // scalar broadcast (rhs)
      val s = y.a(0)
      val out = new Array[Float](x.a.length)
      var i = 0
      while (i < out.length) { out(i) = f(x.a(i), s); i += 1 }
      Mat(x.rows, x.cols, out)
    } else if (x.rows == 1 && x.cols == 1) { // scalar broadcast (lhs)
      val s = x.a(0)
      val out = new Array[Float](y.a.length)
      var i = 0
      while (i < out.length) { out(i) = f(s, y.a(i)); i += 1 }
      Mat(y.rows, y.cols, out)
    } else if (y.rows == 1 && y.cols == x.cols) { // row broadcast
      val out = new Array[Float](x.a.length)
      var r = 0
      while (r < x.rows) {
        var c = 0
        while (c < x.cols) { out(r * x.cols + c) = f(x(r, c), y.a(c)); c += 1 }
        r += 1
      }
      Mat(x.rows, x.cols, out)
    } else throw new IllegalArgumentException(
      s"onnx: $op shapes ${x.rows}x${x.cols} vs ${y.rows}x${y.cols}")
  }

  /** erf via the Abramowitz–Stegun 7.1.26 rational approximation (max abs
    * error 1.5e-7 — below float32 resolution for the GELU use) computed
    * with a FIXED operation order and StrictMath.exp, so results are
    * bit-identical across JVMs (the Softmax determinism rule). The JDK has
    * no Math.erf; pinning our own polynomial is what makes the op
    * reproducible at all.
    */
  private def erfAS(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * Math.abs(x))
    val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    val y = 1.0 - poly * StrictMath.exp(-x * x)
    if (x >= 0.0) y else -y
  }

  /** `A · op(B) (+ bias row-broadcast)` — float accumulation, k ascending
    * (the one order both the executor and the spec replay use).
    */
  private def gemm(x: Mat, w: Mat, transB: Boolean, bias: Option[Mat]): Mat = {
    val (outCols, inner) = if (transB) (w.rows, w.cols) else (w.cols, w.rows)
    require(x.cols == inner, s"onnx: matmul ${x.rows}x${x.cols} · " +
      s"${w.rows}x${w.cols}${if (transB) "ᵀ" else ""}")
    bias.foreach(b => require(b.rows == 1 && b.cols == outCols,
      s"onnx: bias ${b.rows}x${b.cols} != 1x$outCols"))
    val out = new Array[Float](x.rows * outCols)
    var r = 0
    while (r < x.rows) {
      var c = 0
      while (c < outCols) {
        var acc = bias.map(_.a(c)).getOrElse(0f)
        var k = 0
        while (k < inner) {
          acc += x(r, k) * (if (transB) w(c, k) else w(k, c))
          k += 1
        }
        out(r * outCols + c) = acc
        c += 1
      }
      r += 1
    }
    Mat(x.rows, outCols, out)
  }

  // ---- parser -----------------------------------------------------------

  private def parseNode(r: Reader): Node = {
    var op = ""
    var inputs = Vector.empty[String]
    var outputs = Vector.empty[String]
    var attrF = Map.empty[String, Float]
    var attrI = Map.empty[String, Long]
    var attrInts = Map.empty[String, Seq[Long]]
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, 2) =>
          val (off, len) = r.lenDelimited()
          inputs :+= new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (2, 2) =>
          val (off, len) = r.lenDelimited()
          outputs :+= new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (4, 2) =>
          val (off, len) = r.lenDelimited()
          op = new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (5, 2) => // AttributeProto
          val (off, len) = r.lenDelimited()
          val a = new Reader(r.bytes, off, off + len)
          var name = ""
          var f = Option.empty[Float]
          var i = Option.empty[Long]
          var ints = Vector.empty[Long]
          while (a.hasNext) {
            val akey = a.varint()
            ((akey >>> 3).toInt, (akey & 7).toInt) match {
              case (1, 2) =>
                val (aoff, alen) = a.lenDelimited()
                name = new String(a.bytes, aoff, alen, StandardCharsets.UTF_8)
              case (2, 5) =>
                var bits = 0
                var b = 0
                while (b < 4) { bits |= (a.bytes(a.pos + b) & 0xff) << (8 * b); b += 1 }
                a.pos += 4
                f = Some(java.lang.Float.intBitsToFloat(bits))
              case (3, 0) => i = Some(a.varint())
              case (8, 0) => ints :+= a.varint()
              case (8, 2) => // packed ints
                val (aoff, alen) = a.lenDelimited()
                val pr = new Reader(a.bytes, aoff, aoff + alen)
                while (pr.hasNext) ints :+= pr.varint()
              case (_, w) => a.skip(w)
            }
          }
          f.foreach(v => attrF += name -> v)
          i.foreach(v => attrI += name -> v)
          if (ints.nonEmpty) attrInts += name -> ints
        case (_, w) => r.skip(w)
      }
    }
    Node(op, inputs, outputs, attrF, attrI, attrInts)
  }

  /** ValueInfoProto → (name, dim_values — 0 for symbolic dims). */
  private def parseValueInfo(r: Reader): (String, Seq[Long]) = {
    var name = ""
    var dims = Vector.empty[Long]
    while (r.hasNext) {
      val key = r.varint()
      ((key >>> 3).toInt, (key & 7).toInt) match {
        case (1, 2) =>
          val (off, len) = r.lenDelimited()
          name = new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (2, 2) => // TypeProto
          val (toff, tlen) = r.lenDelimited()
          val t = new Reader(r.bytes, toff, toff + tlen)
          while (t.hasNext) {
            val tkey = t.varint()
            if ((tkey >>> 3).toInt == 1 && (tkey & 7).toInt == 2) { // tensor_type
              val (ttoff, ttlen) = t.lenDelimited()
              val tt = new Reader(t.bytes, ttoff, ttoff + ttlen)
              while (tt.hasNext) {
                val ttkey = tt.varint()
                if ((ttkey >>> 3).toInt == 2 && (ttkey & 7).toInt == 2) { // shape
                  val (soff, slen) = tt.lenDelimited()
                  val s = new Reader(tt.bytes, soff, soff + slen)
                  while (s.hasNext) {
                    val skey = s.varint()
                    if ((skey >>> 3).toInt == 1 && (skey & 7).toInt == 2) { // dim
                      val (doff, dlen) = s.lenDelimited()
                      val d = new Reader(s.bytes, doff, doff + dlen)
                      var v = 0L
                      while (d.hasNext) {
                        val dkey = d.varint()
                        if ((dkey >>> 3).toInt == 1 && (dkey & 7).toInt == 0) v = d.varint()
                        else d.skip((dkey & 7).toInt)
                      }
                      dims :+= v
                    } else s.skip((skey & 7).toInt)
                  }
                } else tt.skip((ttkey & 7).toInt)
              }
            } else t.skip((tkey & 7).toInt)
          }
        case (_, w) => r.skip(w)
      }
    }
    (name, dims)
  }

  /** Parse an ONNX model into an executable [[GraphModel]]. The graph must
    * declare exactly one input (the INT64 token-id sequence) and one
    * output (`FLOAT[1, d]`).
    */
  def parse(bytes: Array[Byte]): GraphModel = {
    var tensors = Vector.empty[Tensor]
    var nodes = Vector.empty[Node]
    var gInputs = Vector.empty[(String, Seq[Long])]
    var gOutputs = Vector.empty[(String, Seq[Long])]
    val m = new Reader(bytes, 0, bytes.length)
    while (m.hasNext) {
      val key = m.varint()
      if ((key >>> 3).toInt == 7 && (key & 7).toInt == 2) { // ModelProto.graph
        val (goff, glen) = m.lenDelimited()
        val g = new Reader(bytes, goff, goff + glen)
        while (g.hasNext) {
          val gkey = g.varint()
          ((gkey >>> 3).toInt, (gkey & 7).toInt) match {
            case (1, 2) =>
              val (off, len) = g.lenDelimited()
              nodes :+= parseNode(new Reader(bytes, off, off + len))
            case (5, 2) =>
              val (off, len) = g.lenDelimited()
              tensors :+= parseTensor(new Reader(bytes, off, off + len))
            case (11, 2) =>
              val (off, len) = g.lenDelimited()
              gInputs :+= parseValueInfo(new Reader(bytes, off, off + len))
            case (12, 2) =>
              val (off, len) = g.lenDelimited()
              gOutputs :+= parseValueInfo(new Reader(bytes, off, off + len))
            case (_, w) => g.skip(w)
          }
        }
      } else m.skip((key & 7).toInt)
    }
    require(gInputs.length >= 1 && gInputs.length <= 3,
      s"onnx: expected 1-3 graph inputs (ids[, positions][, mask]), got ${gInputs.length}")
    require(gOutputs.length == 1, s"onnx: expected 1 graph output, got ${gOutputs.length}")
    val outDims = gOutputs.head._2.filter(_ > 0L)
    require(outDims.nonEmpty, "onnx: graph output has no static dim")
    // structural input classification (exporter-order-independent): the
    // first input is the token ids; any further input consumed as Gather
    // indices is the positions input, any other is the attention mask
    val extra = gInputs.tail.map(_._1)
    val gatherIdx = nodes.filter(_.op == "Gather").flatMap(_.inputs.lift(1)).toSet
    val (posIns, maskIns) = extra.partition(gatherIdx)
    require(posIns.length <= 1, s"onnx: multiple positions inputs $posIns")
    require(maskIns.length <= 1, s"onnx: multiple mask inputs $maskIns")
    // INT64 initializers (shape tensors) execute as shape operands, not
    // float Mats; everything else must be a float tensor
    val (intTs, floatTs) = tensors.partition(_.dataType == 7L)
    GraphModel(floatTs.map(t => t.name -> toMat(t)).toMap,
      intTs.map(t => t.name -> t.ints).toMap, nodes,
      gInputs.head._1, posIns.headOption, maskIns.headOption,
      gOutputs.head._1, outDims.last.toInt)
  }

  // ---- embedder ---------------------------------------------------------

  /** [[Embedder]] over a parsed attention graph: whitespace tokens hashed
    * to ids `floorMod(splitmix64(token.hashCode), vocab)` (the FeatureHash
    * idiom — token identity, not signed features: an embedding TABLE wants
    * an index), capped at `seqCap` tokens, graph output l2-normalized (the
    * Embedder contract every model family shares). Null/blank → zero
    * vector (dist 2.0, sorts last).
    */
  final case class TransformerEmbedder(model: GraphModel, seqCap: Int = 64)
      extends Embedder {
    def dim: Int = model.outputDim

    private def ids(text: String): Array[Int] =
      text.split("\\s+").iterator.filter(_.nonEmpty)
        .take(math.min(seqCap, model.seqLimit)) // positional table bounds seq
        .map(t => java.lang.Math.floorMod(splitmix64(t.hashCode.toLong),
          model.vocab.toLong).toInt)
        .toArray

    override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        val toks = if (t == null) Array.empty[Int] else ids(t)
        if (toks.isEmpty) new Array[Float](dim)
        else {
          val y = model.run(toks)
          var norm = 0.0
          var i = 0
          while (i < y.length) { norm += y(i).toDouble * y(i).toDouble; i += 1 }
          if (norm > 0.0) {
            val inv = (1.0 / math.sqrt(norm)).toFloat
            i = 0
            while (i < y.length) { y(i) *= inv; i += 1 }
          }
          y
        }
      }
  }

  /** The text → ids → encoder → vector pipeline the reference's embedder
    * runs (model/search/vector.py:64-78: SentenceTransformer = WordPiece
    * tokenizer + transformer encoder + pooling + l2-normalize), with the
    * subword step REAL: whitespace words decompose by greedy longest-match
    * against a WordPiece vocabulary ([[graft.ops.Subword.greedyPieces]] —
    * the same pure function driver-side oracle literals use), unmatched
    * words map to the [UNK] row — pinned to the LAST embedding-table row,
    * so `model.vocab == wordpiece vocab size + 1` by construction. Piece
    * ids feed the encoder unchanged; output l2-normalizes like every
    * Embedder here. Deterministic end to end: same text → same ids → the
    * same fixed-accumulation float32 forward pass on any JVM.
    */
  final case class SubwordTransformerEmbedder(model: GraphModel,
      vocab: Map[(String, Boolean), Long], maxPieceLen: Int = 4,
      seqCap: Int = 64) extends Embedder {
    require(vocab.nonEmpty, "empty wordpiece vocabulary")
    require(vocab.valuesIterator.forall(id => id >= 0 && id < model.vocab - 1),
      s"wordpiece ids must fit below the [UNK] row ${model.vocab - 1}")
    def dim: Int = model.outputDim
    private val unkId: Long = model.vocab - 1L

    private def ids(text: String): Array[Int] =
      text.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(w => graft.ops.Subword.greedyPieces(w, vocab, maxPieceLen, unkId))
        .take(math.min(seqCap, model.seqLimit))
        .map(_.toInt)
        .toArray

    override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        val toks = if (t == null) Array.empty[Int] else ids(t)
        if (toks.isEmpty) new Array[Float](dim)
        else {
          val y = model.run(toks)
          var norm = 0.0
          var i = 0
          while (i < y.length) { norm += y(i).toDouble * y(i).toDouble; i += 1 }
          if (norm > 0.0) {
            val inv = (1.0 / math.sqrt(norm)).toFloat
            i = 0
            while (i < y.length) { y(i) *= inv; i += 1 }
          }
          y
        }
      }
  }

  /** The PADDED-BATCH embedder the reference's batch encode() actually
    * runs (model/search/vector.py:64-78: SentenceTransformer batches
    * variable-length inputs, pads to the batch max, and feeds a 0/1
    * attention_mask to the MASKED export): each embedBatch call pads every
    * sequence to the batch's longest with pad-id 0 and mask 0, so the
    * executor-side forward pass genuinely exercises the exporter's mask
    * chain — additive `(1-mask)·(-10^4)` before every head's softmax,
    * masked mean-pool instead of ReduceMean. The masked graph's
    * padding-invariance (padded run == unpadded run BIT-exactly,
    * OnnxTransformerSpec) is what makes this deterministic under Spark:
    * batch composition depends on partitioning, but the result of each
    * row does not depend on its batch-mates, so the gate hash cannot see
    * the partition layout. Tokenization is the same greedy WordPiece
    * longest-match as [[SubwordTransformerEmbedder]].
    */
  final case class PaddedSubwordTransformerEmbedder(model: GraphModel,
      vocab: Map[(String, Boolean), Long], maxPieceLen: Int = 4,
      seqCap: Int = 64) extends Embedder {
    require(vocab.nonEmpty, "empty wordpiece vocabulary")
    require(vocab.valuesIterator.forall(id => id >= 0 && id < model.vocab - 1),
      s"wordpiece ids must fit below the [UNK] row ${model.vocab - 1}")
    require(model.maskInputName.isDefined,
      "padded-batch embedding requires a masked export (attention_mask " +
        "input) — an unmasked graph would attend to the pad rows")
    def dim: Int = model.outputDim
    private val unkId: Long = model.vocab - 1L

    private def ids(text: String): Array[Int] =
      text.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(w => graft.ops.Subword.greedyPieces(w, vocab, maxPieceLen, unkId))
        .take(math.min(seqCap, model.seqLimit))
        .map(_.toInt)
        .toArray

    override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val idSeqs = texts.map(t => if (t == null) Array.empty[Int] else ids(t))
      val maxLen = if (idSeqs.isEmpty) 0 else idSeqs.map(_.length).max
      idSeqs.map { toks =>
        if (toks.isEmpty) new Array[Float](dim)
        else {
          // pad-id 0 (any valid row — masked out of scores AND pooling)
          val padded = java.util.Arrays.copyOf(toks, maxLen)
          val mask = new Array[Float](maxLen)
          java.util.Arrays.fill(mask, 0, toks.length, 1f)
          val y = model.run(padded, mask)
          var norm = 0.0
          var i = 0
          while (i < y.length) { norm += y(i).toDouble * y(i).toDouble; i += 1 }
          if (norm > 0.0) {
            val inv = (1.0 / math.sqrt(norm)).toFloat
            i = 0
            while (i < y.length) { y(i) *= inv; i += 1 }
          }
          y
        }
      }
    }
  }

  /** Loader twins of the linear/MLP loaders — same registry lifecycle. */
  def fileLoader(path: String): (String, Int) => Embedder = (_, d) => {
    val m = TransformerEmbedder(parse(Files.readAllBytes(Paths.get(path))))
    require(m.dim == d, s"onnx transformer dim ${m.dim} != requested $d")
    m
  }

  def resourceLoader(resource: String): (String, Int) => Embedder = (_, d) => {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"onnx model resource $resource not on classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val m = TransformerEmbedder(parse(bytes))
    require(m.dim == d, s"onnx transformer dim ${m.dim} != requested $d")
    m
  }

  // ---- writer (fixture generation, offline) -----------------------------

  /** One-block single-head encoder weights. Layouts follow the repo's
    * row-major `[out, in]` Gemm(transB=1) convention throughout.
    */
  final case class TransformerWeights(vocab: Int, d: Int, hidden: Int,
      e: Array[Float],                                  // [vocab, d]
      wq: Array[Float], bq: Array[Float],               // [d, d], [d]
      wk: Array[Float], bk: Array[Float],
      wv: Array[Float], bv: Array[Float],
      wo: Array[Float], bo: Array[Float],
      ln1g: Array[Float], ln1b: Array[Float],           // [d]
      w1: Array[Float], b1: Array[Float],               // [hidden, d], [hidden]
      w2: Array[Float], b2: Array[Float],               // [d, hidden], [d]
      ln2g: Array[Float], ln2b: Array[Float],
      eps: Float = 1e-5f,
      pos: Array[Float] = Array.empty,                  // [maxSeq, d] (optional)
      activation: String = "Relu") {                    // FFN nonlinearity
    require(e.length == vocab * d && wq.length == d * d && w1.length == hidden * d
      && w2.length == d * hidden, "transformer weight shapes inconsistent")
    require(pos.isEmpty || pos.length % d == 0,
      s"positional table ${pos.length} not a multiple of d=$d")
    require(Set("Relu", "Gelu", "Tanh")(activation),
      s"unsupported FFN activation '$activation' (Relu | Gelu | Tanh)")
  }

  /** FFN activation subgraph for the writers. Relu/Tanh are one node;
    * Gelu is the exporter-standard opset<20 decomposition
    * `x·0.5·(1+erf(x/√2))` over Div/Erf/Add/Mul with scalar-constant
    * initializers (see [[activationInits]]). `nm` prefixes node/tensor
    * names for per-layer uniqueness in stacked graphs. Relu emits the
    * byte-identical node the pre-activation writers emitted, so existing
    * fixtures stay byte-reproducible.
    */
  private def activationNodes(activation: String, nm: String => String,
      inN: String, outN: String): Seq[Array[Byte]] = activation match {
    case "Relu" => Seq(node("Relu", nm("ffn_act"), Seq(inN), outN))
    case "Tanh" => Seq(node("Tanh", nm("ffn_act"), Seq(inN), outN))
    case "Gelu" => Seq(
      node("Div", nm("gelu_div"), Seq(inN, "gelu_sqrt2"), nm("g0")),
      node("Erf", nm("gelu_erf"), Seq(nm("g0")), nm("g1")),
      node("Add", nm("gelu_add1"), Seq(nm("g1"), "gelu_one"), nm("g2")),
      node("Mul", nm("gelu_mulx"), Seq(inN, nm("g2")), nm("g3")),
      node("Mul", nm("gelu_half"), Seq(nm("g3"), "gelu_halfc"), outN))
    case a => throw new IllegalArgumentException(s"unsupported activation $a")
  }

  /** Scalar-constant initializers the Gelu decomposition reads (emitted
    * once per graph, shared by all layers).
    */
  private def activationInits(g: Writer, activation: String): Unit =
    if (activation == "Gelu") {
      g.bytes(5, floatTensor("gelu_sqrt2", Seq(1L), Array(Math.sqrt(2.0).toFloat)))
      g.bytes(5, floatTensor("gelu_one", Seq(1L), Array(1f)))
      g.bytes(5, floatTensor("gelu_halfc", Seq(1L), Array(0.5f)))
    }

  private def floatAttr(name: String, v: Float): Array[Byte] =
    new Writer().str(1, name)
      .fixed32(2, java.lang.Float.floatToIntBits(v)).int(20, 1L).toByteArray

  private def intsAttr(name: String, vs: Seq[Long]): Array[Byte] = {
    val w = new Writer().str(1, name)
    vs.foreach(v => w.int(8, v))
    w.int(20, 7L).toByteArray
  }

  /** ValueInfoProto for an INT64 vector with a symbolic (dim_param) dim. */
  private def int64VectorInfo(name: String, dimParam: String): Array[Byte] = {
    val shape = new Writer()
      .bytes(1, new Writer().str(2, dimParam).toByteArray)
    val tensorType = new Writer()
      .int(1, 7L) // elem_type INT64
      .bytes(2, shape.toByteArray)
    val typeProto = new Writer().bytes(1, tensorType.toByteArray)
    new Writer().str(1, name).bytes(2, typeProto.toByteArray).toByteArray
  }

  private def node(op: String, name: String, ins: Seq[String], out: String,
      attrs: Seq[Array[Byte]] = Nil): Array[Byte] = {
    val w = new Writer()
    ins.foreach(w.str(1, _))
    w.str(2, out).str(3, name).str(4, op)
    attrs.foreach(w.bytes(5, _))
    w.toByteArray
  }

  /** Encode the canonical one-block encoder (opset 17 — the
    * LayerNormalization op). Deterministic bytes; round-trips through
    * [[parse]] bit-exactly.
    */
  def toBytes(m: TransformerWeights): Array[Byte] = {
    val d = m.d.toLong
    val tB = intAttr("transB", 1L)
    val g = new Writer()
    val positional = m.pos.nonEmpty
    // with a positional table the token embedding is x = E[ids] + P[0..n-1]
    // (the second Gather reads the runtime-fed positions input — the
    // standard exporter shape); without one, x = E[ids] directly
    val embedNodes =
      if (positional) Seq(
        node("Gather", "embed", Seq("E", "ids"), "x0"),
        node("Gather", "pos_embed", Seq("P", "pos"), "px"),
        node("Add", "add_pos", Seq("x0", "px"), "x"))
      else Seq(node("Gather", "embed", Seq("E", "ids"), "x"))
    (embedNodes ++ Seq(
      node("Gemm", "q_proj", Seq("x", "Wq", "bq"), "q", Seq(tB)),
      node("Gemm", "k_proj", Seq("x", "Wk", "bk"), "k", Seq(tB)),
      node("Gemm", "v_proj", Seq("x", "Wv", "bv"), "v", Seq(tB)),
      node("Transpose", "k_t", Seq("k"), "kt", Seq(intsAttr("perm", Seq(1L, 0L)))),
      node("MatMul", "scores", Seq("q", "kt"), "s"),
      node("Div", "scale", Seq("s", "sqrt_d"), "ss"),
      node("Softmax", "attn", Seq("ss"), "a", Seq(intAttr("axis", -1L))),
      node("MatMul", "context", Seq("a", "v"), "ctx"),
      node("Gemm", "o_proj", Seq("ctx", "Wo", "bo"), "o", Seq(tB)),
      node("Add", "residual1", Seq("o", "x"), "r1"),
      node("LayerNormalization", "ln1", Seq("r1", "ln1g", "ln1b"), "n1",
        Seq(intAttr("axis", -1L), floatAttr("epsilon", m.eps))),
      node("Gemm", "ffn1", Seq("n1", "W1", "b1"), "f1", Seq(tB))) ++
      activationNodes(m.activation, identity, "f1", "f1r") ++ Seq(
      node("Gemm", "ffn2", Seq("f1r", "W2", "b2"), "f2", Seq(tB)),
      node("Add", "residual2", Seq("f2", "n1"), "r2"),
      node("LayerNormalization", "ln2", Seq("r2", "ln2g", "ln2b"), "n2",
        Seq(intAttr("axis", -1L), floatAttr("epsilon", m.eps))),
      node("ReduceMean", "pool", Seq("n2"), "y",
        Seq(intsAttr("axes", Seq(0L)), intAttr("keepdims", 1L)))
    )).foreach(g.bytes(1, _))
    g.str(2, "graft_attention")
    activationInits(g, m.activation)
    g.bytes(5, floatTensor("E", Seq(m.vocab.toLong, d), m.e))
    if (positional)
      g.bytes(5, floatTensor("P", Seq((m.pos.length / m.d).toLong, d), m.pos))
    Seq(("Wq", m.wq), ("Wk", m.wk), ("Wv", m.wv), ("Wo", m.wo))
      .foreach { case (n, w) => g.bytes(5, floatTensor(n, Seq(d, d), w)) }
    Seq(("bq", m.bq), ("bk", m.bk), ("bv", m.bv), ("bo", m.bo),
      ("ln1g", m.ln1g), ("ln1b", m.ln1b), ("ln2g", m.ln2g), ("ln2b", m.ln2b))
      .foreach { case (n, b) => g.bytes(5, floatTensor(n, Seq(d), b)) }
    g.bytes(5, floatTensor("W1", Seq(m.hidden.toLong, d), m.w1))
    g.bytes(5, floatTensor("b1", Seq(m.hidden.toLong), m.b1))
    g.bytes(5, floatTensor("W2", Seq(d, m.hidden.toLong), m.w2))
    g.bytes(5, floatTensor("b2", Seq(d), m.b2))
    g.bytes(5, floatTensor("sqrt_d",
      Seq(1L), Array(Math.sqrt(m.d.toDouble).toFloat)))
    g.bytes(11, int64VectorInfo("ids", "seq"))
    if (positional) g.bytes(11, int64VectorInfo("pos", "seq"))
    g.bytes(12, valueInfo("y", Seq(1L, d)))
    val opset = new Writer().str(1, "").int(2, 17L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, g.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
  }

  /** Encode the MULTI-HEAD variant of the encoder block. Standard MHA is
    * expressible inside the 2-D op subset with no Reshape/Slice: head h's
    * Q/K/V projections are Gemm nodes over the ROW-slices
    * `Wq[h·dh, (h+1)·dh)` of the fused weight (row-major `[out, in]`
    * layout makes the slice contiguous), each head runs its own
    * `softmax(Q_h·K_hᵀ/√dh)·V_h` chain, and `Concat(axis=1)` rebuilds the
    * `[n, d]` context for the shared output projection — mathematically
    * the textbook formulation, and a legal ONNX graph. `heads = 1`
    * delegates to [[toBytes]] (the byte-stable fixture shape).
    */
  def toMultiHeadBytes(m: TransformerWeights, heads: Int): Array[Byte] = {
    if (heads == 1) return toBytes(m)
    require(heads > 1 && m.d % heads == 0,
      s"heads $heads must divide model dim ${m.d}")
    val d = m.d.toLong
    val dh = m.d / heads
    val tB = intAttr("transB", 1L)
    val g = new Writer()
    val positional = m.pos.nonEmpty
    val embedNodes =
      if (positional) Seq(
        node("Gather", "embed", Seq("E", "ids"), "x0"),
        node("Gather", "pos_embed", Seq("P", "pos"), "px"),
        node("Add", "add_pos", Seq("x0", "px"), "x"))
      else Seq(node("Gather", "embed", Seq("E", "ids"), "x"))
    val headNodes = (0 until heads).flatMap { h =>
      Seq(
        node("Gemm", s"q_proj_$h", Seq("x", s"Wq_$h", s"bq_$h"), s"q$h", Seq(tB)),
        node("Gemm", s"k_proj_$h", Seq("x", s"Wk_$h", s"bk_$h"), s"k$h", Seq(tB)),
        node("Gemm", s"v_proj_$h", Seq("x", s"Wv_$h", s"bv_$h"), s"v$h", Seq(tB)),
        node("Transpose", s"k_t_$h", Seq(s"k$h"), s"kt$h",
          Seq(intsAttr("perm", Seq(1L, 0L)))),
        node("MatMul", s"scores_$h", Seq(s"q$h", s"kt$h"), s"s$h"),
        node("Div", s"scale_$h", Seq(s"s$h", "sqrt_dh"), s"ss$h"),
        node("Softmax", s"attn_$h", Seq(s"ss$h"), s"a$h", Seq(intAttr("axis", -1L))),
        node("MatMul", s"context_$h", Seq(s"a$h", s"v$h"), s"ctx$h"))
    }
    (embedNodes ++ headNodes ++ Seq(
      node("Concat", "merge_heads", (0 until heads).map(h => s"ctx$h"), "ctx",
        Seq(intAttr("axis", 1L))),
      node("Gemm", "o_proj", Seq("ctx", "Wo", "bo"), "o", Seq(tB)),
      node("Add", "residual1", Seq("o", "x"), "r1"),
      node("LayerNormalization", "ln1", Seq("r1", "ln1g", "ln1b"), "n1",
        Seq(intAttr("axis", -1L), floatAttr("epsilon", m.eps))),
      node("Gemm", "ffn1", Seq("n1", "W1", "b1"), "f1", Seq(tB))) ++
      activationNodes(m.activation, identity, "f1", "f1r") ++ Seq(
      node("Gemm", "ffn2", Seq("f1r", "W2", "b2"), "f2", Seq(tB)),
      node("Add", "residual2", Seq("f2", "n1"), "r2"),
      node("LayerNormalization", "ln2", Seq("r2", "ln2g", "ln2b"), "n2",
        Seq(intAttr("axis", -1L), floatAttr("epsilon", m.eps))),
      node("ReduceMean", "pool", Seq("n2"), "y",
        Seq(intsAttr("axes", Seq(0L)), intAttr("keepdims", 1L)))
    )).foreach(g.bytes(1, _))
    g.str(2, "graft_attention_mh")
    activationInits(g, m.activation)
    g.bytes(5, floatTensor("E", Seq(m.vocab.toLong, d), m.e))
    if (positional)
      g.bytes(5, floatTensor("P", Seq((m.pos.length / m.d).toLong, d), m.pos))
    (0 until heads).foreach { h =>
      def rowSlice(w: Array[Float]): Array[Float] =
        w.slice(h * dh * m.d, (h + 1) * dh * m.d)
      def bSlice(b: Array[Float]): Array[Float] = b.slice(h * dh, (h + 1) * dh)
      g.bytes(5, floatTensor(s"Wq_$h", Seq(dh.toLong, d), rowSlice(m.wq)))
      g.bytes(5, floatTensor(s"bq_$h", Seq(dh.toLong), bSlice(m.bq)))
      g.bytes(5, floatTensor(s"Wk_$h", Seq(dh.toLong, d), rowSlice(m.wk)))
      g.bytes(5, floatTensor(s"bk_$h", Seq(dh.toLong), bSlice(m.bk)))
      g.bytes(5, floatTensor(s"Wv_$h", Seq(dh.toLong, d), rowSlice(m.wv)))
      g.bytes(5, floatTensor(s"bv_$h", Seq(dh.toLong), bSlice(m.bv)))
    }
    g.bytes(5, floatTensor("Wo", Seq(d, d), m.wo))
    Seq(("bo", m.bo), ("ln1g", m.ln1g), ("ln1b", m.ln1b),
      ("ln2g", m.ln2g), ("ln2b", m.ln2b))
      .foreach { case (n, b) => g.bytes(5, floatTensor(n, Seq(d), b)) }
    g.bytes(5, floatTensor("W1", Seq(m.hidden.toLong, d), m.w1))
    g.bytes(5, floatTensor("b1", Seq(m.hidden.toLong), m.b1))
    g.bytes(5, floatTensor("W2", Seq(d, m.hidden.toLong), m.w2))
    g.bytes(5, floatTensor("b2", Seq(d), m.b2))
    g.bytes(5, floatTensor("sqrt_dh",
      Seq(1L), Array(Math.sqrt(dh.toDouble).toFloat)))
    g.bytes(11, int64VectorInfo("ids", "seq"))
    if (positional) g.bytes(11, int64VectorInfo("pos", "seq"))
    g.bytes(12, valueInfo("y", Seq(1L, d)))
    val opset = new Writer().str(1, "").int(2, 17L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, g.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
  }

  /** INT64 tensor initializer (shape/axes operands — raw_data 8-byte LE). */
  private def int64Tensor(name: String, dims: Seq[Long],
      vs: Array[Long]): Array[Byte] = {
    val raw = java.nio.ByteBuffer.allocate(vs.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(raw.putLong)
    val w = new Writer()
    dims.foreach(d => w.int(1, d))
    w.int(2, 7L) // data_type INT64
      .str(8, name)
      .bytes(9, raw.array())
      .toByteArray
  }

  /** Encode the MASKED encoder block — the standard sentence-transformer
    * export shape: a third graph input `attention_mask: INT64[seq]` flows
    * through the exporter's mask chain (Cast→float, Unsqueeze with the
    * opset-13 axes INPUT, `(1 - mask)·(-10⁴)`), the additive mask lands on
    * every head's scaled scores BEFORE softmax, and pooling is the masked
    * mean (`mask·H / Σmask` via MatMul + ReduceSum-13 + Div) instead of
    * ReduceMean — so padded positions influence nothing: an all-ones mask
    * reproduces the unmasked graph bit-exactly, and a padded run
    * reproduces the unpadded run bit-exactly (both spec-asserted).
    */
  def toMaskedBytes(m: TransformerWeights, heads: Int = 1): Array[Byte] = {
    require(heads >= 1 && m.d % heads == 0,
      s"heads $heads must divide model dim ${m.d}")
    val d = m.d.toLong
    val dh = m.d / heads
    val tB = intAttr("transB", 1L)
    val g = new Writer()
    val positional = m.pos.nonEmpty
    val embedNodes =
      if (positional) Seq(
        node("Gather", "embed", Seq("E", "ids"), "x0"),
        node("Gather", "pos_embed", Seq("P", "pos"), "px"),
        node("Add", "add_pos", Seq("x0", "px"), "x"))
      else Seq(node("Gather", "embed", Seq("E", "ids"), "x"))
    val maskNodes = Seq(
      node("Cast", "mask_cast", Seq("attention_mask"), "mf0",
        Seq(intAttr("to", 1L))),
      node("Unsqueeze", "mask_unsq", Seq("mf0", "unsq_axes"), "mf"),
      node("Sub", "mask_inv", Seq("one_c", "mf"), "minv"),
      node("Mul", "mask_add", Seq("minv", "neg_c"), "madd"))
    val headNodes = (0 until heads).flatMap { h =>
      Seq(
        node("Gemm", s"q_proj_$h", Seq("x", s"Wq_$h", s"bq_$h"), s"q$h", Seq(tB)),
        node("Gemm", s"k_proj_$h", Seq("x", s"Wk_$h", s"bk_$h"), s"k$h", Seq(tB)),
        node("Gemm", s"v_proj_$h", Seq("x", s"Wv_$h", s"bv_$h"), s"v$h", Seq(tB)),
        node("Transpose", s"k_t_$h", Seq(s"k$h"), s"kt$h",
          Seq(intsAttr("perm", Seq(1L, 0L)))),
        node("MatMul", s"scores_$h", Seq(s"q$h", s"kt$h"), s"s$h"),
        node("Div", s"scale_$h", Seq(s"s$h", "sqrt_dh"), s"ss$h"),
        node("Add", s"mask_scores_$h", Seq(s"ss$h", "madd"), s"sm$h"),
        node("Softmax", s"attn_$h", Seq(s"sm$h"), s"a$h", Seq(intAttr("axis", -1L))),
        node("MatMul", s"context_$h", Seq(s"a$h", s"v$h"), s"ctx$h"))
    }
    val mergeNodes =
      if (heads == 1) Seq(
        node("Gemm", "o_proj", Seq("ctx0", "Wo", "bo"), "o", Seq(tB)))
      else Seq(
        node("Concat", "merge_heads", (0 until heads).map(h => s"ctx$h"), "ctx",
          Seq(intAttr("axis", 1L))),
        node("Gemm", "o_proj", Seq("ctx", "Wo", "bo"), "o", Seq(tB)))
    (embedNodes ++ maskNodes ++ headNodes ++ mergeNodes ++ Seq(
      node("Add", "residual1", Seq("o", "x"), "r1"),
      node("LayerNormalization", "ln1", Seq("r1", "ln1g", "ln1b"), "n1",
        Seq(intAttr("axis", -1L), floatAttr("epsilon", m.eps))),
      node("Gemm", "ffn1", Seq("n1", "W1", "b1"), "f1", Seq(tB))) ++
      activationNodes(m.activation, identity, "f1", "f1r") ++ Seq(
      node("Gemm", "ffn2", Seq("f1r", "W2", "b2"), "f2", Seq(tB)),
      node("Add", "residual2", Seq("f2", "n1"), "r2"),
      node("LayerNormalization", "ln2", Seq("r2", "ln2g", "ln2b"), "n2",
        Seq(intAttr("axis", -1L), floatAttr("epsilon", m.eps))),
      // masked mean-pool: Σ_i mask_i·h_i / Σ_i mask_i — the
      // sentence-transformer pooling layer compiled to MatMul/ReduceSum/Div
      node("MatMul", "pool_sum", Seq("mf", "n2"), "psum"),
      node("ReduceSum", "pool_cnt", Seq("mf", "rs_axes"), "pcnt",
        Seq(intAttr("keepdims", 1L))),
      node("Div", "pool", Seq("psum", "pcnt"), "y")
    )).foreach(g.bytes(1, _))
    g.str(2, "graft_attention_masked")
    activationInits(g, m.activation)
    g.bytes(5, floatTensor("E", Seq(m.vocab.toLong, d), m.e))
    if (positional)
      g.bytes(5, floatTensor("P", Seq((m.pos.length / m.d).toLong, d), m.pos))
    (0 until heads).foreach { h =>
      def rowSlice(w: Array[Float]): Array[Float] =
        w.slice(h * dh * m.d, (h + 1) * dh * m.d)
      def bSlice(b: Array[Float]): Array[Float] = b.slice(h * dh, (h + 1) * dh)
      g.bytes(5, floatTensor(s"Wq_$h", Seq(dh.toLong, d), rowSlice(m.wq)))
      g.bytes(5, floatTensor(s"bq_$h", Seq(dh.toLong), bSlice(m.bq)))
      g.bytes(5, floatTensor(s"Wk_$h", Seq(dh.toLong, d), rowSlice(m.wk)))
      g.bytes(5, floatTensor(s"bk_$h", Seq(dh.toLong), bSlice(m.bk)))
      g.bytes(5, floatTensor(s"Wv_$h", Seq(dh.toLong, d), rowSlice(m.wv)))
      g.bytes(5, floatTensor(s"bv_$h", Seq(dh.toLong), bSlice(m.bv)))
    }
    g.bytes(5, floatTensor("Wo", Seq(d, d), m.wo))
    Seq(("bo", m.bo), ("ln1g", m.ln1g), ("ln1b", m.ln1b),
      ("ln2g", m.ln2g), ("ln2b", m.ln2b))
      .foreach { case (n, b) => g.bytes(5, floatTensor(n, Seq(d), b)) }
    g.bytes(5, floatTensor("W1", Seq(m.hidden.toLong, d), m.w1))
    g.bytes(5, floatTensor("b1", Seq(m.hidden.toLong), m.b1))
    g.bytes(5, floatTensor("W2", Seq(d, m.hidden.toLong), m.w2))
    g.bytes(5, floatTensor("b2", Seq(d), m.b2))
    g.bytes(5, floatTensor("sqrt_dh",
      Seq(1L), Array(Math.sqrt(dh.toDouble).toFloat)))
    g.bytes(5, floatTensor("one_c", Seq(1L), Array(1f)))
    g.bytes(5, floatTensor("neg_c", Seq(1L), Array(-10000f)))
    g.bytes(5, int64Tensor("unsq_axes", Seq(1L), Array(0L)))
    g.bytes(5, int64Tensor("rs_axes", Seq(1L), Array(-1L)))
    g.bytes(11, int64VectorInfo("ids", "seq"))
    if (positional) g.bytes(11, int64VectorInfo("pos", "seq"))
    g.bytes(11, int64VectorInfo("attention_mask", "seq"))
    g.bytes(12, valueInfo("y", Seq(1L, d)))
    val opset = new Writer().str(1, "").int(2, 17L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, g.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
  }

  /** Encode an L-layer encoder STACK — the full (toy) sentence-transformer
    * shape: token (+ positional) embedding, then `blocks.length`
    * multi-head encoder blocks chained input→output, then mean-pool.
    * Layer i's attention/FFN weights come from `blocks(i)`; the embedding
    * tables and epsilon come from `blocks.head`; `heads` applies to every
    * layer. The executor needs nothing new — a stack is just a longer
    * topologically-ordered node list over the same op subset.
    */
  def toStackedBytes(blocks: Seq[TransformerWeights],
      heads: Int = 1): Array[Byte] = {
    require(blocks.nonEmpty, "at least one encoder block")
    val head = blocks.head
    require(blocks.forall(b => b.d == head.d && b.hidden == head.hidden &&
        b.activation == head.activation),
      "all blocks must share (d, hidden, activation)")
    require(heads >= 1 && head.d % heads == 0,
      s"heads $heads must divide model dim ${head.d}")
    val d = head.d.toLong
    val dh = head.d / heads
    val tB = intAttr("transB", 1L)
    val g = new Writer()
    val positional = head.pos.nonEmpty
    val embedNodes =
      if (positional) Seq(
        node("Gather", "embed", Seq("E", "ids"), "x0"),
        node("Gather", "pos_embed", Seq("P", "pos"), "px"),
        node("Add", "add_pos", Seq("x0", "px"), "x"))
      else Seq(node("Gather", "embed", Seq("E", "ids"), "x"))
    val layerNodes = blocks.indices.flatMap { l =>
      val in = if (l == 0) "x" else s"n2_L${l - 1}"
      val out = s"n2_L$l"
      def t(n: String) = s"${n}_L$l"
      val headNodes = (0 until heads).flatMap { h =>
        Seq(
          node("Gemm", t(s"q_proj_$h"), Seq(in, t(s"Wq_$h"), t(s"bq_$h")), t(s"q$h"), Seq(tB)),
          node("Gemm", t(s"k_proj_$h"), Seq(in, t(s"Wk_$h"), t(s"bk_$h")), t(s"k$h"), Seq(tB)),
          node("Gemm", t(s"v_proj_$h"), Seq(in, t(s"Wv_$h"), t(s"bv_$h")), t(s"v$h"), Seq(tB)),
          node("Transpose", t(s"k_t_$h"), Seq(t(s"k$h")), t(s"kt$h"),
            Seq(intsAttr("perm", Seq(1L, 0L)))),
          node("MatMul", t(s"scores_$h"), Seq(t(s"q$h"), t(s"kt$h")), t(s"s$h")),
          node("Div", t(s"scale_$h"), Seq(t(s"s$h"), "sqrt_dh"), t(s"ss$h")),
          node("Softmax", t(s"attn_$h"), Seq(t(s"ss$h")), t(s"a$h"),
            Seq(intAttr("axis", -1L))),
          node("MatMul", t(s"context_$h"), Seq(t(s"a$h"), t(s"v$h")), t(s"ctx$h")))
      }
      headNodes ++ Seq(
        node("Concat", t("merge_heads"), (0 until heads).map(h => t(s"ctx$h")),
          t("ctx"), Seq(intAttr("axis", 1L))),
        node("Gemm", t("o_proj"), Seq(t("ctx"), t("Wo"), t("bo")), t("o"), Seq(tB)),
        node("Add", t("residual1"), Seq(t("o"), in), t("r1")),
        node("LayerNormalization", t("ln1"), Seq(t("r1"), t("ln1g"), t("ln1b")),
          t("n1"), Seq(intAttr("axis", -1L), floatAttr("epsilon", head.eps))),
        node("Gemm", t("ffn1"), Seq(t("n1"), t("W1"), t("b1")), t("f1"), Seq(tB))) ++
        activationNodes(head.activation, t, t("f1"), t("f1r")) ++ Seq(
        node("Gemm", t("ffn2"), Seq(t("f1r"), t("W2"), t("b2")), t("f2"), Seq(tB)),
        node("Add", t("residual2"), Seq(t("f2"), t("n1")), t("r2")),
        node("LayerNormalization", t("ln2"), Seq(t("r2"), t("ln2g"), t("ln2b")),
          out, Seq(intAttr("axis", -1L), floatAttr("epsilon", head.eps))))
    }
    (embedNodes ++ layerNodes :+
      node("ReduceMean", "pool", Seq(s"n2_L${blocks.length - 1}"), "y",
        Seq(intsAttr("axes", Seq(0L)), intAttr("keepdims", 1L))))
      .foreach(g.bytes(1, _))
    g.str(2, "graft_attention_stack")
    activationInits(g, head.activation)
    g.bytes(5, floatTensor("E", Seq(head.vocab.toLong, d), head.e))
    if (positional)
      g.bytes(5, floatTensor("P", Seq((head.pos.length / head.d).toLong, d), head.pos))
    blocks.zipWithIndex.foreach { case (m, l) =>
      def t(n: String) = s"${n}_L$l"
      def rowSlice(w: Array[Float], h: Int): Array[Float] =
        w.slice(h * dh * m.d, (h + 1) * dh * m.d)
      def bSlice(b: Array[Float], h: Int): Array[Float] =
        b.slice(h * dh, (h + 1) * dh)
      (0 until heads).foreach { h =>
        g.bytes(5, floatTensor(t(s"Wq_$h"), Seq(dh.toLong, d), rowSlice(m.wq, h)))
        g.bytes(5, floatTensor(t(s"bq_$h"), Seq(dh.toLong), bSlice(m.bq, h)))
        g.bytes(5, floatTensor(t(s"Wk_$h"), Seq(dh.toLong, d), rowSlice(m.wk, h)))
        g.bytes(5, floatTensor(t(s"bk_$h"), Seq(dh.toLong), bSlice(m.bk, h)))
        g.bytes(5, floatTensor(t(s"Wv_$h"), Seq(dh.toLong, d), rowSlice(m.wv, h)))
        g.bytes(5, floatTensor(t(s"bv_$h"), Seq(dh.toLong), bSlice(m.bv, h)))
      }
      g.bytes(5, floatTensor(t("Wo"), Seq(d, d), m.wo))
      Seq((t("bo"), m.bo), (t("ln1g"), m.ln1g), (t("ln1b"), m.ln1b),
        (t("ln2g"), m.ln2g), (t("ln2b"), m.ln2b))
        .foreach { case (n, b) => g.bytes(5, floatTensor(n, Seq(d), b)) }
      g.bytes(5, floatTensor(t("W1"), Seq(m.hidden.toLong, d), m.w1))
      g.bytes(5, floatTensor(t("b1"), Seq(m.hidden.toLong), m.b1))
      g.bytes(5, floatTensor(t("W2"), Seq(d, m.hidden.toLong), m.w2))
      g.bytes(5, floatTensor(t("b2"), Seq(d), m.b2))
    }
    g.bytes(5, floatTensor("sqrt_dh",
      Seq(1L), Array(Math.sqrt(dh.toDouble).toFloat)))
    g.bytes(11, int64VectorInfo("ids", "seq"))
    if (positional) g.bytes(11, int64VectorInfo("pos", "seq"))
    g.bytes(12, valueInfo("y", Seq(1L, d)))
    val opset = new Writer().str(1, "").int(2, 17L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, g.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
  }

  /** Encode the MASKED L-layer encoder STACK — [[toMaskedBytes]]'s mask
    * chain and masked mean-pool around [[toStackedBytes]]'s chained
    * blocks: the full standard sentence-transformer export shape
    * (attention_mask flows into every layer's every head's scores; the
    * pool is the masked mean). Same bit-exactness contracts as the
    * one-block masked writer (spec-asserted through the stacked replay).
    */
  def toMaskedStackedBytes(blocks: Seq[TransformerWeights],
      heads: Int = 1): Array[Byte] = {
    require(blocks.nonEmpty, "at least one encoder block")
    val head = blocks.head
    require(blocks.forall(b => b.d == head.d && b.hidden == head.hidden &&
        b.activation == head.activation),
      "all blocks must share (d, hidden, activation)")
    require(heads >= 1 && head.d % heads == 0,
      s"heads $heads must divide model dim ${head.d}")
    val d = head.d.toLong
    val dh = head.d / heads
    val tB = intAttr("transB", 1L)
    val g = new Writer()
    val positional = head.pos.nonEmpty
    val embedNodes =
      if (positional) Seq(
        node("Gather", "embed", Seq("E", "ids"), "x0"),
        node("Gather", "pos_embed", Seq("P", "pos"), "px"),
        node("Add", "add_pos", Seq("x0", "px"), "x"))
      else Seq(node("Gather", "embed", Seq("E", "ids"), "x"))
    val maskNodes = Seq(
      node("Cast", "mask_cast", Seq("attention_mask"), "mf0",
        Seq(intAttr("to", 1L))),
      node("Unsqueeze", "mask_unsq", Seq("mf0", "unsq_axes"), "mf"),
      node("Sub", "mask_inv", Seq("one_c", "mf"), "minv"),
      node("Mul", "mask_add", Seq("minv", "neg_c"), "madd"))
    val layerNodes = blocks.indices.flatMap { l =>
      val in = if (l == 0) "x" else s"n2_L${l - 1}"
      val out = s"n2_L$l"
      def t(n: String) = s"${n}_L$l"
      val headNodes = (0 until heads).flatMap { h =>
        Seq(
          node("Gemm", t(s"q_proj_$h"), Seq(in, t(s"Wq_$h"), t(s"bq_$h")), t(s"q$h"), Seq(tB)),
          node("Gemm", t(s"k_proj_$h"), Seq(in, t(s"Wk_$h"), t(s"bk_$h")), t(s"k$h"), Seq(tB)),
          node("Gemm", t(s"v_proj_$h"), Seq(in, t(s"Wv_$h"), t(s"bv_$h")), t(s"v$h"), Seq(tB)),
          node("Transpose", t(s"k_t_$h"), Seq(t(s"k$h")), t(s"kt$h"),
            Seq(intsAttr("perm", Seq(1L, 0L)))),
          node("MatMul", t(s"scores_$h"), Seq(t(s"q$h"), t(s"kt$h")), t(s"s$h")),
          node("Div", t(s"scale_$h"), Seq(t(s"s$h"), "sqrt_dh"), t(s"ss$h")),
          node("Add", t(s"mask_scores_$h"), Seq(t(s"ss$h"), "madd"), t(s"sm$h")),
          node("Softmax", t(s"attn_$h"), Seq(t(s"sm$h")), t(s"a$h"),
            Seq(intAttr("axis", -1L))),
          node("MatMul", t(s"context_$h"), Seq(t(s"a$h"), t(s"v$h")), t(s"ctx$h")))
      }
      val merge =
        if (heads == 1) Seq(
          node("Gemm", t("o_proj"), Seq(t("ctx0"), t("Wo"), t("bo")), t("o"), Seq(tB)))
        else Seq(
          node("Concat", t("merge_heads"), (0 until heads).map(h => t(s"ctx$h")),
            t("ctx"), Seq(intAttr("axis", 1L))),
          node("Gemm", t("o_proj"), Seq(t("ctx"), t("Wo"), t("bo")), t("o"), Seq(tB)))
      headNodes ++ merge ++ Seq(
        node("Add", t("residual1"), Seq(t("o"), in), t("r1")),
        node("LayerNormalization", t("ln1"), Seq(t("r1"), t("ln1g"), t("ln1b")),
          t("n1"), Seq(intAttr("axis", -1L), floatAttr("epsilon", head.eps))),
        node("Gemm", t("ffn1"), Seq(t("n1"), t("W1"), t("b1")), t("f1"), Seq(tB))) ++
        activationNodes(head.activation, t, t("f1"), t("f1r")) ++ Seq(
        node("Gemm", t("ffn2"), Seq(t("f1r"), t("W2"), t("b2")), t("f2"), Seq(tB)),
        node("Add", t("residual2"), Seq(t("f2"), t("n1")), t("r2")),
        node("LayerNormalization", t("ln2"), Seq(t("r2"), t("ln2g"), t("ln2b")),
          out, Seq(intAttr("axis", -1L), floatAttr("epsilon", head.eps))))
    }
    (embedNodes ++ maskNodes ++ layerNodes ++ Seq(
      node("MatMul", "pool_sum", Seq("mf", s"n2_L${blocks.length - 1}"), "psum"),
      node("ReduceSum", "pool_cnt", Seq("mf", "rs_axes"), "pcnt",
        Seq(intAttr("keepdims", 1L))),
      node("Div", "pool", Seq("psum", "pcnt"), "y")))
      .foreach(g.bytes(1, _))
    g.str(2, "graft_attention_masked_stack")
    activationInits(g, head.activation)
    g.bytes(5, floatTensor("E", Seq(head.vocab.toLong, d), head.e))
    if (positional)
      g.bytes(5, floatTensor("P", Seq((head.pos.length / head.d).toLong, d), head.pos))
    blocks.zipWithIndex.foreach { case (m, l) =>
      def t(n: String) = s"${n}_L$l"
      def rowSlice(w: Array[Float], h: Int): Array[Float] =
        w.slice(h * dh * m.d, (h + 1) * dh * m.d)
      def bSlice(b: Array[Float], h: Int): Array[Float] =
        b.slice(h * dh, (h + 1) * dh)
      (0 until heads).foreach { h =>
        g.bytes(5, floatTensor(t(s"Wq_$h"), Seq(dh.toLong, d), rowSlice(m.wq, h)))
        g.bytes(5, floatTensor(t(s"bq_$h"), Seq(dh.toLong), bSlice(m.bq, h)))
        g.bytes(5, floatTensor(t(s"Wk_$h"), Seq(dh.toLong, d), rowSlice(m.wk, h)))
        g.bytes(5, floatTensor(t(s"bk_$h"), Seq(dh.toLong), bSlice(m.bk, h)))
        g.bytes(5, floatTensor(t(s"Wv_$h"), Seq(dh.toLong, d), rowSlice(m.wv, h)))
        g.bytes(5, floatTensor(t(s"bv_$h"), Seq(dh.toLong), bSlice(m.bv, h)))
      }
      g.bytes(5, floatTensor(t("Wo"), Seq(d, d), m.wo))
      Seq((t("bo"), m.bo), (t("ln1g"), m.ln1g), (t("ln1b"), m.ln1b),
        (t("ln2g"), m.ln2g), (t("ln2b"), m.ln2b))
        .foreach { case (n, b) => g.bytes(5, floatTensor(n, Seq(d), b)) }
      g.bytes(5, floatTensor(t("W1"), Seq(m.hidden.toLong, d), m.w1))
      g.bytes(5, floatTensor(t("b1"), Seq(m.hidden.toLong), m.b1))
      g.bytes(5, floatTensor(t("W2"), Seq(d, m.hidden.toLong), m.w2))
      g.bytes(5, floatTensor(t("b2"), Seq(d), m.b2))
    }
    g.bytes(5, floatTensor("sqrt_dh",
      Seq(1L), Array(Math.sqrt(dh.toDouble).toFloat)))
    g.bytes(5, floatTensor("one_c", Seq(1L), Array(1f)))
    g.bytes(5, floatTensor("neg_c", Seq(1L), Array(-10000f)))
    g.bytes(5, int64Tensor("unsq_axes", Seq(1L), Array(0L)))
    g.bytes(5, int64Tensor("rs_axes", Seq(1L), Array(-1L)))
    g.bytes(11, int64VectorInfo("ids", "seq"))
    if (positional) g.bytes(11, int64VectorInfo("pos", "seq"))
    g.bytes(11, int64VectorInfo("attention_mask", "seq"))
    g.bytes(12, valueInfo("y", Seq(1L, d)))
    val opset = new Writer().str(1, "").int(2, 17L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, g.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
  }

  /** Deterministic small weights from a seed (fixture generation — the
    * checked-in artifact is byte-reproducible from this).
    */
  def seededWeights(seed: Long, vocab: Int = 32, d: Int = 16,
      hidden: Int = 32, posRows: Int = 0): TransformerWeights = {
    var n = 0L
    def f(scale: Float): Float = {
      n += 1
      val u = splitmix64(seed ^ n).toDouble / Long.MaxValue.toDouble
      (u * scale).toFloat
    }
    def arr(len: Int, scale: Float): Array[Float] =
      Array.fill(len)(f(scale))
    TransformerWeights(vocab, d, hidden,
      e = arr(vocab * d, 1f),
      wq = arr(d * d, 0.3f), bq = arr(d, 0.05f),
      wk = arr(d * d, 0.3f), bk = arr(d, 0.05f),
      wv = arr(d * d, 0.3f), bv = arr(d, 0.05f),
      wo = arr(d * d, 0.3f), bo = arr(d, 0.05f),
      ln1g = Array.fill(d)(1f), ln1b = new Array[Float](d),
      w1 = arr(hidden * d, 0.2f), b1 = arr(hidden, 0.05f),
      w2 = arr(d * hidden, 0.2f), b2 = arr(d, 0.05f),
      ln2g = Array.fill(d)(1f), ln2b = new Array[Float](d),
      pos = arr(posRows * d, 0.5f))
  }
}
