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
  * dependency is needed to read the subset a linear
  * `embed(text) = l2norm(W · features(text))` model uses: ModelProto →
  * GraphProto → a MatMul node + its 2-D FLOAT weight initializer (raw_data
  * little-endian or packed float_data). Heavier architectures swap in an
  * actual ONNX runtime behind the same `(name, dim) => Embedder` loader
  * signature — the seam, registry, and broadcast plumbing do not change.
  *
  * The writer exists so fixtures are reproducible offline (zero egress):
  * [[toBytes]] emits a canonical minimal model that real ONNX tooling
  * accepts (ir_version, opset import, graph IO declared), and
  * [[fromBytes]] round-trips it bit-exactly.
  */
object OnnxLinearModel {

  // ---- minimal protobuf wire-format reader -------------------------------

  private final class Reader(val bytes: Array[Byte], var pos: Int, val end: Int) {
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

  private final case class Tensor(name: String, dims: Seq[Long],
      dataType: Long, floats: Array[Float])

  private def parseTensor(r: Reader): Tensor = {
    var name = ""
    var dims = Vector.empty[Long]
    var dataType = 0L
    var floats = Array.empty[Float]
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
        case (8, 2) =>
          val (off, len) = r.lenDelimited()
          name = new String(r.bytes, off, len, StandardCharsets.UTF_8)
        case (9, 2) => // raw_data: little-endian per ONNX spec
          val (off, len) = r.lenDelimited()
          floats = readFloatsLE(r.bytes, off, len / 4)
        case (_, w) => r.skip(w)
      }
    }
    Tensor(name, dims, dataType, floats)
  }

  private def parseNode(r: Reader): (String, Seq[String]) = { // (op_type, inputs)
    var op = ""
    var inputs = Vector.empty[String]
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
        case (_, w) => r.skip(w)
      }
    }
    (op, inputs)
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
              val (op, inputs) = parseNode(new Reader(bytes, off, off + len))
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

  private final class Writer {
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
    def toByteArray: Array[Byte] = out.toByteArray
  }

  /** Encode a canonical minimal ONNX model: ir_version 8, opset 13, graph
    * `y = MatMul(x, W)` with W as a raw_data FLOAT initializer of dims
    * `[dim, features]`. Deterministic bytes — the checked-in fixture is
    * reproducible from the text artifact.
    */
  def toBytes(m: LinearModelEmbedder): Array[Byte] = {
    val raw = java.nio.ByteBuffer.allocate(m.w.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    m.w.foreach(raw.putFloat)
    val tensor = new Writer()
      .int(1, m.dim.toLong).int(1, m.features.toLong) // dims
      .int(2, 1L) // data_type FLOAT
      .str(8, "W")
      .bytes(9, raw.array())
    val node = new Writer()
      .str(1, "x").str(1, "W") // inputs
      .str(2, "y") // output
      .str(3, "linear")
      .str(4, "MatMul")
    val graph = new Writer()
      .bytes(1, node.toByteArray)
      .str(2, "graft_linear")
      .bytes(5, tensor.toByteArray)
    val opset = new Writer().str(1, "").int(2, 13L)
    new Writer()
      .int(1, 8L) // ir_version
      .bytes(7, graph.toByteArray)
      .bytes(8, opset.toByteArray)
      .toByteArray
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
}
