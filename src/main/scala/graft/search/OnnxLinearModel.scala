package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** ONNX artifact support for the linear embedder — the real-model seam
  * proven on an actual ONNX protobuf file, not only the `graft-linear-v1`
  * text fixture. The reference loads its embedder from a real model
  * artifact once per process (model/search/vector.py:41-62); here the same
  * [[ModelRegistry]]/[[SingletonEmbedder]] lifecycle parses a genuine
  * `.onnx` binary.
  *
  * ONNX is plain protobuf over the public `onnx.proto` schema; no runtime
  * dependency is needed to read the executable subset here: ModelProto →
  * GraphProto → a `Gemm(transB=1)`/MatMul(+Add bias) chain with Relu
  * between layers, weights as 2-D FLOAT initializers (raw_data
  * little-endian or packed float_data). [[fromBytes]] parses the
  * single-layer linear case; [[parseMlp]] executes the multi-layer chain
  * through [[MlpEmbedder]]; [[OnnxTransformer]] executes a full
  * single-head attention encoder block as a named dataflow graph. The
  * cutoff where an actual ONNX runtime swaps in behind the same
  * `(name, dim) => Embedder` loader signature is now real pretrained
  * multi-head/multi-layer models — the seam, registry, and broadcast
  * plumbing do not change.
  *
  * The writers exist so fixtures are reproducible offline (zero egress):
  * [[toBytes]]/[[toMlpBytes]] emit canonical minimal models (ir_version,
  * opset import, graph input/output ValueInfo declared, Gemm transB=1 so
  * the tensor semantics genuinely match the `[out, in]` row-major weight
  * layout), and the readers round-trip them bit-exactly.
  */
object OnnxLinearModel {

  // ---- minimal protobuf wire-format reader -------------------------------
  // (private[search]: OnnxTransformer reuses the same wire primitives for
  // the attention-block subset)

  private[search] final class Reader(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while ({
        val b = bytes(pos); pos += 1
        out |= (b & 0x7fL) << shift
        shift += 7
        (b & 0x80) != 0
      }) ()
      out
    }
    def lenDelimited(): (Int, Int) = { // (offset, length)
      val n = varint().toInt
      val off = pos
      pos += n
      (off, n)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelimited()
      case 5 => pos += 4
      case t => throw new IllegalArgumentException(s"onnx: wire type $t unsupported")
    }
  }

  private[search] final case class Tensor(name: String, dims: Seq[Long],
      dataType: Long, floats: Array[Float],
      ints: Array[Long] = Array.empty[Long])

  private[search] def parseTensor(r: Reader): Tensor = {
    var name = ""
    var dims = Vector.empty[Long]
    var dataType = 0L
    var floats = Array.empty[Float]
    var ints = Array.empty[Long]
    // raw_data decodes by dataType, which proto field order does not
    // guarantee precedes it — remember the span and decode at the end
    var rawOff = -1
    var rawLen = 0
    while (r.hasNext) {
      val key = r.varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 0) => dims :+= r.varint()
        case (1, 2) => // packed dims
          val (off, len) = r.lenDelimited()
          val pr = new Reader(r.bytes, off, off + len)
          while (pr.hasNext) dims :+= pr.varint()
        case (2, 0) => dataType = r.varint()
        case (4, 2) => // packed float_data
          val (off, len) = r.lenDelimited()
          floats = readFloatsLE(r.bytes, off, len / 4)
        case (4, 5) => // unpacked float_data element
          floats :+= java.lang.Float.intBitsToFloat(readIntLE(r.bytes, r.pos))
          r.pos += 4
        case (7, 2) => // packed int64_data (Reshape/Expand shape tensors)
          val (off, len) = r.lenDelimited()
          val pr = new Reader(r.bytes, off, off + len)
          var acc = Vector.empty[Long]
          while (pr.hasNext) acc :+= pr.varint()
          ints = acc.toArray
        case (7, 0) => ints :+= r.varint() // unpacked int64_data element
        case (8, 2) =>
          val (off, len) = r.lenDelimited()
          name = new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (9, 2) => // raw_data: little-endian per ONNX spec
          val (off, len) = r.lenDelimited()
          rawOff = off; rawLen = len
        case (_, w) => r.skip(w)
      }
    }
    if (rawOff >= 0) {
      if (dataType == 7L) { // INT64 raw payload: 8-byte LE
        ints = Array.tabulate(rawLen / 8) { i =>
          var v = 0L
          var b = 0
          while (b < 8) { v |= (r.bytes(rawOff + i * 8 + b) & 0xffL) << (8 * b); b += 1 }
          v
        }
      } else floats = readFloatsLE(r.bytes, rawOff, rawLen / 4)
    }
    // ONNX int64 varints are two's-complement 64-bit — already exact longs
    Tensor(name, dims, dataType, floats, ints)
  }

  // (op_type, inputs, float attrs, int attrs) — attrs matter for Gemm:
  // silently dropping transB/alpha/beta would execute an externally
  // exported transB=0 Gemm with transposed weights.
  private def parseNode(r: Reader): (String, Seq[String], Map[String, Float], Map[String, Long]) = {
    var op = ""
    var inputs = Vector.empty[String]
    var attrF = Map.empty[String, Float]
    var attrI = Map.empty[String, Long]
    while (r.hasNext) {
      val key = r.varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 2) =>
          val (off, len) = r.lenDelimited()
          inputs :+= new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (4, 2) =>
          val (off, len) = r.lenDelimited()
          op = new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (5, 2) => // AttributeProto
          val (aoff, alen) = r.lenDelimited()
          val a = new Reader(r.bytes, aoff, aoff + alen)
          var name = ""
          var f = Option.empty[Float]
          var i = Option.empty[Long]
          while (a.hasNext) {
            val akey = a.varint()
            ((akey >>> 3).toInt, (akey & 7).toInt) match {
              case (1, 2) =>
                val (noff, nlen) = a.lenDelimited()
                name = new String(a.bytes, noff, nlen, StandardCharsets.UTF_8)
              case (2, 5) =>
                var bits = 0
                var b = 0
                while (b < 4) { bits |= (a.bytes(a.pos + b) & 0xff) << (8 * b); b += 1 }
                a.pos += 4
                f = Some(java.lang.Float.intBitsToFloat(bits))
              case (3, 0) => i = Some(a.varint())
              case (_, w) => a.skip(w)
            }
          }
          f.foreach(v => attrF += name -> v)
          i.foreach(v => attrI += name -> v)
        case (_, w) => r.skip(w)
      }
    }
    (op, inputs, attrF, attrI)
  }

  /** GraphProto → (initializers by name, nodes in file order). ONNX
    * requires nodes to be topologically sorted, so file order IS execution
    * order for the sequential subset here.
    */
  private def parseGraph(bytes: Array[Byte])
      : (Map[String, Tensor], Seq[(String, Seq[String], Map[String, Float], Map[String, Long])]) = {
    var tensors = Vector.empty[Tensor]
    var nodes = Vector.empty[(String, Seq[String], Map[String, Float], Map[String, Long])]
    val m = new Reader(bytes, 0, bytes.length)
    while (m.hasNext) {
      val key = m.varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      if (field == 7 && wire == 2) { // ModelProto.graph
        val (goff, glen) = m.lenDelimited()
        val g = new Reader(bytes, goff, goff + glen)
        while (g.hasNext) {
          val gkey = g.varint()
          val gfield = (gkey >>> 3).toInt
          val gwire = (gkey & 7).toInt
          (gfield, gwire) match {
            case (1, 2) => // node
              val (off, len) = g.lenDelimited()
              nodes :+= parseNode(new Reader(bytes, off, off + len))
            case (5, 2) => // initializer
              val (off, len) = g.lenDelimited()
              tensors :+= parseTensor(new Reader(bytes, off, off + len))
            case (_, w) => g.skip(w)
          }
        }
      } else m.skip(wire)
    }
    (tensors.map(t => t.name -> t).toMap, nodes)
  }

  /** Parse an ONNX MLP chain — the executable subset one step past the
    * linear model: `(Gemm | MatMul Add?) (Relu (Gemm | MatMul Add?))*`.
    * Weights are 2-D FLOAT initializers `[out, in]` row-major (Gemm with
    * `transB = 1` — the canonical orientation [[toMlpBytes]] emits);
    * biases are 1-D FLOAT initializers. Relu must separate consecutive
    * layers and never follow the last (the [[MlpEmbedder]] architecture).
    * Anything outside the subset fails loudly — attention-class graphs
    * go through [[OnnxTransformer.parse]]'s dataflow executor instead.
    */
  def parseMlp(bytes: Array[Byte]): MlpEmbedder = {
    val (tensors, nodes) = parseGraph(bytes)
    def weight(name: String): Tensor = {
      val t = tensors.getOrElse(name,
        throw new IllegalArgumentException(s"onnx: no initializer '$name'"))
      require(t.dataType == 1L && t.dims.length == 2,
        s"onnx: tensor '$name' is not a 2-D FLOAT weight")
      t
    }
    def bias(names: Seq[String]): Array[Float] = {
      val cands = names.flatMap(tensors.get).filter(t =>
        t.dataType == 1L && t.dims.length == 1)
      require(cands.length == 1,
        s"onnx: expected exactly one 1-D FLOAT bias among ${names.mkString(",")}")
      cands.head.floats
    }
    // [in, out] row-major → [out, in] row-major. Third-party exporters
    // (ONNX default transB=0, and every MatMul) store weights in the
    // x·W orientation; the executor runs W·x, so re-layout ONCE at parse
    // time — load-time cost, zero inference cost, and the artifact's
    // semantics (not our canonical layout) decide correctness.
    def transposed(t: Tensor): Array[Float] = {
      val (rows, cols) = (t.dims(0).toInt, t.dims(1).toInt)
      val out = new Array[Float](t.floats.length)
      var r = 0
      while (r < rows) {
        var c = 0
        while (c < cols) { out(c * rows + r) = t.floats(r * cols + c); c += 1 }
        r += 1
      }
      out
    }
    var layers = Vector.empty[MlpLayer]
    var relusAfter = Vector.empty[Int]
    nodes.foreach {
      case ("Gemm", inputs, attrF, attrI) =>
        require(inputs.length >= 2, "onnx: Gemm needs (x, W[, b])")
        // The executor assumes y = x·Wᵀ + b (transB=1, W [out, in]); a
        // transB=0 export (the ONNX attribute default — what most
        // third-party tools emit) carries W as [in, out] and is
        // re-laid-out at parse time. Anything else outside the exact
        // y = x·W(ᵀ) + b parameterization (transA, alpha/beta scaling)
        // must fail loudly, not run with mis-scaled weights.
        require(attrI.getOrElse("transA", 0L) == 0L,
          "onnx: Gemm with transA=1 outside the executable subset")
        require(attrF.getOrElse("alpha", 1f) == 1f && attrF.getOrElse("beta", 1f) == 1f,
          "onnx: Gemm with alpha/beta != 1 outside the executable subset")
        val w = weight(inputs(1))
        val b = if (inputs.length >= 3) bias(Seq(inputs(2))) else Array.empty[Float]
        layers :+=
          (if (attrI.getOrElse("transB", 0L) == 1L)
            MlpLayer(w.dims(0).toInt, w.dims(1).toInt, w.floats, b)
          else
            MlpLayer(w.dims(1).toInt, w.dims(0).toInt, transposed(w), b))
      case ("MatMul", inputs, _, _) =>
        require(inputs.length == 2, "onnx: MatMul needs (x, W)")
        // ONNX MatMul is y = x·W with W [in, out] — always re-laid-out
        val w = weight(inputs(1))
        layers :+= MlpLayer(w.dims(1).toInt, w.dims(0).toInt, transposed(w),
          Array.empty[Float])
      case ("Add", inputs, _, _) =>
        require(layers.nonEmpty && layers.last.b.isEmpty,
          "onnx: Add without a preceding bias-less MatMul")
        layers = layers.init :+ layers.last.copy(b = bias(inputs))
      case ("Relu", _, _, _) =>
        require(layers.nonEmpty, "onnx: Relu before any layer")
        relusAfter :+= layers.length
      case (op, _, _, _) =>
        throw new IllegalArgumentException(
          s"onnx: op '$op' outside the MatMul/Gemm/Add/Relu subset")
    }
    require(layers.nonEmpty, "onnx: no layers found")
    require(relusAfter == (1 until layers.length).toVector,
      s"onnx: Relu placement $relusAfter does not separate the " +
        s"${layers.length} layers (expected between each pair, never last)")
    MlpEmbedder(layers)
  }

  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readFloatsLE(b: Array[Byte], off: Int, n: Int): Array[Float] = {
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Float.intBitsToFloat(readIntLE(b, off + 4 * i))
      i += 1
    }
    out
  }

  /** Parse an ONNX model holding one linear layer: the weight is the 2-D
    * FLOAT initializer consumed by a MatMul/Gemm node (or the single 2-D
    * FLOAT initializer if the graph carries exactly one). dims are
    * `[dim, features]`, row-major — the [[LinearModelEmbedder]] layout.
    */
  def fromBytes(bytes: Array[Byte]): LinearModelEmbedder = {
    var tensors = Vector.empty[Tensor]
    var matmulInputs = Vector.empty[String]
    val m = new Reader(bytes, 0, bytes.length)
    while (m.hasNext) {
      val key = m.varint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      if (field == 7 && wire == 2) { // ModelProto.graph
        val (goff, glen) = m.lenDelimited()
        val g = new Reader(bytes, goff, goff + glen)
        while (g.hasNext) {
          val gkey = g.varint()
          val gfield = (gkey >>> 3).toInt
          val gwire = (gkey & 7).toInt
          (gfield, gwire) match {
            case (1, 2) => // node
              val (off, len) = g.lenDelimited()
              val (op, inputs, _, _) = parseNode(new Reader(bytes, off, off + len))
              if (op == "MatMul" || op == "Gemm") matmulInputs ++= inputs
            case (5, 2) => // initializer
              val (off, len) = g.lenDelimited()
              tensors :+= parseTensor(new Reader(bytes, off, off + len))
            case (_, w) => g.skip(w)
          }
        }
      } else m.skip(wire)
    }
    val candidates = tensors.filter(t => t.dataType == 1L && t.dims.length == 2)
    require(candidates.nonEmpty, "onnx: no 2-D FLOAT initializer found")
    val w = candidates.find(t => matmulInputs.contains(t.name))
      .getOrElse {
        require(candidates.length == 1,
          s"onnx: ${candidates.length} weight candidates and no MatMul/Gemm reference")
        candidates.head
      }
    val Seq(dim, features) = w.dims.map(_.toInt)
    require(w.floats.length == dim * features,
      s"onnx: tensor '${w.name}' holds ${w.floats.length} floats, dims say ${dim}x$features")
    LinearModelEmbedder(dim, features, w.floats)
  }

  // ---- minimal protobuf writer (fixture generation, offline) -------------

  private[search] final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Writer = {
      var x = v
      while ({
        val b = (x & 0x7f).toInt
        x >>>= 7
        out.write(if (x != 0) b | 0x80 else b)
        x != 0
      }) ()
      this
    }
    def key(field: Int, wire: Int): Writer = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Writer = {
      key(field, 2).varint(b.length)
      out.write(b)
      this
    }
    def str(field: Int, s: String): Writer =
      bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def int(field: Int, v: Long): Writer = key(field, 0).varint(v)
    def fixed32(field: Int, bits: Int): Writer = { // wire type 5 (float)
      key(field, 5)
      out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
      out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
      this
    }
    def toByteArray: Array[Byte] = out.toByteArray
  }

  /** TensorProto bytes for a FLOAT tensor (raw_data little-endian). */
  private[search] def floatTensor(name: String, dims: Seq[Long],
      floats: Array[Float]): Array[Byte] = {
    val raw = java.nio.ByteBuffer.allocate(floats.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    floats.foreach(raw.putFloat)
    val w = new Writer()
    dims.foreach(d => w.int(1, d))
    w.int(2, 1L) // data_type FLOAT
      .str(8, name)
      .bytes(9, raw.array())
      .toByteArray
  }

  /** ValueInfoProto bytes: FLOAT tensor `name` of static shape `dims` —
    * the graph input/output declarations onnx.checker requires.
    */
  private[search] def valueInfo(name: String, dims: Seq[Long]): Array[Byte] = {
    val shape = new Writer()
    dims.foreach(d =>
      shape.bytes(1, new Writer().int(1, d).toByteArray)) // Dimension.dim_value
    val tensorType = new Writer()
      .int(1, 1L) // elem_type FLOAT
      .bytes(2, shape.toByteArray)
    val typeProto = new Writer().bytes(1, tensorType.toByteArray)
    new Writer().str(1, name).bytes(2, typeProto.toByteArray).toByteArray
  }

  /** AttributeProto bytes for an INT attribute (name=1, i=3, type=20/INT). */
  private[search] def intAttr(name: String, v: Long): Array[Byte] =
    new Writer().str(1, name).int(3, v).int(20, 2L).toByteArray

  /** AttributeProto bytes for a FLOAT attribute (name=1, f=2, type=20/FLOAT). */
  private[search] def floatAttr(name: String, v: Float): Array[Byte] =
    new Writer().str(1, name)
      .fixed32(2, java.lang.Float.floatToIntBits(v)).int(20, 1L).toByteArray

  private[search] def modelBytes(graph: Writer): Array[Byte] = {
    val opset = new Writer().str(1, "").int(2, 13L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, graph.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
  }

  /** Encode a canonical minimal ONNX model: ir_version 8, opset 13, graph
    * `y = Gemm(x, W, transB=1)` with W as a raw_data FLOAT initializer of
    * dims `[dim, features]` and graph input/output ValueInfo declared
    * (`x: FLOAT[1, features]`, `y: FLOAT[1, dim]`) — so the semantics
    * (`y = x·Wᵀ`) genuinely match the embedder's `W·f` with the row-major
    * `[out, in]` weight layout, instead of relying on a private MatMul
    * orientation convention. Deterministic bytes — the checked-in fixture
    * is reproducible from the text artifact.
    */
  def toBytes(m: LinearModelEmbedder): Array[Byte] = {
    val node = new Writer()
      .str(1, "x").str(1, "W") // inputs
      .str(2, "y") // output
      .str(3, "linear")
      .str(4, "Gemm")
      .bytes(5, intAttr("transB", 1L))
    val graph = new Writer()
      .bytes(1, node.toByteArray)
      .str(2, "graft_linear")
      .bytes(5, floatTensor("W", Seq(m.dim.toLong, m.features.toLong), m.w))
      .bytes(11, valueInfo("x", Seq(1L, m.features.toLong)))
      .bytes(12, valueInfo("y", Seq(1L, m.dim.toLong)))
    modelBytes(graph)
  }

  /** Encode an [[MlpEmbedder]] as the canonical ONNX chain
    * `Gemm(transB=1) → Relu → ... → Gemm(transB=1)` with per-layer
    * `W_i [out, in]` / `b_i [out]` initializers and graph IO declared.
    * Round-trips bit-exactly through [[parseMlp]].
    */
  def toMlpBytes(m: MlpEmbedder): Array[Byte] = {
    val graph = new Writer()
    m.layers.zipWithIndex.foreach { case (l, i) =>
      val in = if (i == 0) "x" else s"h$i"
      val gemmOut = if (i == m.layers.length - 1) "y" else s"g${i + 1}"
      val node = new Writer()
        .str(1, in).str(1, s"W${i + 1}")
      if (l.b.nonEmpty) node.str(1, s"b${i + 1}")
      node.str(2, gemmOut)
        .str(3, s"gemm${i + 1}")
        .str(4, "Gemm")
        .bytes(5, intAttr("transB", 1L))
      graph.bytes(1, node.toByteArray)
      if (i < m.layers.length - 1) {
        val relu = new Writer()
          .str(1, gemmOut).str(2, s"h${i + 1}")
          .str(3, s"relu${i + 1}").str(4, "Relu")
        graph.bytes(1, relu.toByteArray)
      }
    }
    graph.str(2, "graft_mlp")
    m.layers.zipWithIndex.foreach { case (l, i) =>
      graph.bytes(5, floatTensor(s"W${i + 1}",
        Seq(l.outDim.toLong, l.inDim.toLong), l.w))
      if (l.b.nonEmpty)
        graph.bytes(5, floatTensor(s"b${i + 1}", Seq(l.outDim.toLong), l.b))
    }
    graph
      .bytes(11, valueInfo("x", Seq(1L, m.features.toLong)))
      .bytes(12, valueInfo("y", Seq(1L, m.dim.toLong)))
    modelBytes(graph)
  }

  /** Encode the SAME MLP the way a typical third-party exporter does —
    * the checkpoint-portability fixture: `Gemm` with NO `transB`
    * attribute (ONNX default 0), weights stored `[in, out]` (the x·W
    * orientation), and the default `alpha`/`beta` **explicitly
    * serialized** as FLOAT attributes (torch.onnx-style exporters write
    * defaults out rather than omitting them). Must execute bit-identically
    * to [[toMlpBytes]]'s canonical transB=1 artifact through [[parseMlp]];
    * proving that is what makes an externally-trained checkpoint loadable.
    */
  def toMlpBytesExternal(m: MlpEmbedder): Array[Byte] = {
    val graph = new Writer()
    m.layers.zipWithIndex.foreach { case (l, i) =>
      val in = if (i == 0) "x" else s"h$i"
      val gemmOut = if (i == m.layers.length - 1) "y" else s"g${i + 1}"
      val node = new Writer()
        .str(1, in).str(1, s"W${i + 1}")
      if (l.b.nonEmpty) node.str(1, s"b${i + 1}")
      node.str(2, gemmOut)
        .str(3, s"gemm${i + 1}")
        .str(4, "Gemm")
        .bytes(5, floatAttr("alpha", 1f))
        .bytes(5, floatAttr("beta", 1f))
        .bytes(5, intAttr("transA", 0L))
      graph.bytes(1, node.toByteArray)
      if (i < m.layers.length - 1) {
        val relu = new Writer()
          .str(1, gemmOut).str(2, s"h${i + 1}")
          .str(3, s"relu${i + 1}").str(4, "Relu")
        graph.bytes(1, relu.toByteArray)
      }
    }
    graph.str(2, "thirdparty_mlp")
    m.layers.zipWithIndex.foreach { case (l, i) =>
      // [out, in] → [in, out]: store the x·W orientation
      val wT = new Array[Float](l.w.length)
      var r = 0
      while (r < l.outDim) {
        var c = 0
        while (c < l.inDim) { wT(c * l.outDim + r) = l.w(r * l.inDim + c); c += 1 }
        r += 1
      }
      graph.bytes(5, floatTensor(s"W${i + 1}",
        Seq(l.inDim.toLong, l.outDim.toLong), wT))
      if (l.b.nonEmpty)
        graph.bytes(5, floatTensor(s"b${i + 1}", Seq(l.outDim.toLong), l.b))
    }
    graph
      .bytes(11, valueInfo("x", Seq(1L, m.features.toLong)))
      .bytes(12, valueInfo("y", Seq(1L, m.dim.toLong)))
    modelBytes(graph)
  }

  /** Loader twin of [[LinearModelEmbedder.fileLoader]] for `.onnx`
    * artifacts — same once-per-JVM registry lifecycle.
    */
  def fileLoader(path: String): (String, Int) => Embedder = (_, d) => {
    val m = fromBytes(Files.readAllBytes(Paths.get(path)))
    require(m.dim == d, s"onnx artifact dim ${m.dim} != requested $d")
    m
  }

  /** Loader twin of [[LinearModelEmbedder.resourceLoader]] for `.onnx`
    * artifacts shipped on the classpath.
    */
  def resourceLoader(resource: String): (String, Int) => Embedder = (_, d) => {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"onnx model resource $resource not on classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val m = fromBytes(bytes)
    require(m.dim == d, s"onnx artifact dim ${m.dim} != requested $d")
    m
  }

  /** [[parseMlp]]-backed loaders — same once-per-JVM registry lifecycle as
    * every other model loader; dim checked against the LAST layer.
    */
  def mlpFileLoader(path: String): (String, Int) => Embedder = (_, d) => {
    val m = parseMlp(Files.readAllBytes(Paths.get(path)))
    require(m.dim == d, s"onnx MLP artifact dim ${m.dim} != requested $d")
    m
  }

  def mlpResourceLoader(resource: String): (String, Int) => Embedder = (_, d) => {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"onnx model resource $resource not on classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val m = parseMlp(bytes)
    require(m.dim == d, s"onnx MLP artifact dim ${m.dim} != requested $d")
    m
  }
}
