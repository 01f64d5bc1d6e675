package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint portability: an ONNX MLP exported by a THIRD-PARTY tool —
  * ONNX-default `transB=0` Gemm with `[in, out]` weights, defaults
  * explicitly serialized, or MatMul(+Add) chains — must execute
  * bit-identically to the canonical `transB=1` artifact, and anything
  * outside the executable parameterization (transA, alpha/beta scaling)
  * must fail loudly instead of running with mis-scaled weights. Mirrors
  * the reference's load-from-artifact lifecycle
  * (/root/reference/model/search/vector.py:41-62).
  */
class OnnxExternalCheckpointSpec extends AnyFunSuite {

  // deterministic rectangular 2-layer MLP (dims chosen unequal so any
  // orientation mistake breaks either the chain require or the values)
  private def mlp: MlpEmbedder = {
    val w1 = Array.tabulate(6 * 16)(i => ((i * 2654435761L % 97).toInt - 48) / 48.0f)
    val b1 = Array.tabulate(6)(i => (i - 3) / 10.0f)
    val w2 = Array.tabulate(4 * 6)(i => ((i * 40503L % 89).toInt - 44) / 44.0f)
    val b2 = Array.tabulate(4)(i => (2 - i) / 7.0f)
    MlpEmbedder(Seq(MlpLayer(6, 16, w1, b1), MlpLayer(4, 6, w2, b2)))
  }

  private val texts = Seq("a fine document", "graft corp", "", "mixed 混合 text")

  test("third-party transB=0 export executes bit-identically to the canonical artifact") {
    val canonical = OnnxLinearModel.parseMlp(OnnxLinearModel.toMlpBytes(mlp))
    val external = OnnxLinearModel.parseMlp(OnnxLinearModel.toMlpBytesExternal(mlp))
    val a = canonical.embedBatch(texts).map(_.toSeq)
    val b = external.embedBatch(texts).map(_.toSeq)
    assert(a == b)
    assert(external.dim == mlp.dim && external.features == mlp.features)
  }

  // ---- inline third-party graph authoring (same writers the canonical
  // exporters use; arbitrary attribute/op shapes) ----

  import OnnxLinearModel.{Writer, floatTensor, intAttr, floatAttr, valueInfo, modelBytes}

  /** One-layer y = x·W (+ b) as a MatMul(+Add) chain with W `[in, out]` —
    * the orientation every ONNX MatMul carries.
    */
  private def matmulAddModel(withBias: Boolean): Array[Byte] = {
    val l = mlp.layers.head
    val wT = new Array[Float](l.w.length)
    for (r <- 0 until l.outDim; c <- 0 until l.inDim)
      wT(c * l.outDim + r) = l.w(r * l.inDim + c)
    val graph = new Writer()
    val mm = new Writer().str(1, "x").str(1, "W")
      .str(2, if (withBias) "mm" else "y").str(3, "matmul").str(4, "MatMul")
    graph.bytes(1, mm.toByteArray)
    if (withBias) {
      val add = new Writer().str(1, "mm").str(1, "b")
        .str(2, "y").str(3, "add").str(4, "Add")
      graph.bytes(1, add.toByteArray)
    }
    graph.str(2, "thirdparty_matmul")
      .bytes(5, floatTensor("W", Seq(l.inDim.toLong, l.outDim.toLong), wT))
    if (withBias) graph.bytes(5, floatTensor("b", Seq(l.outDim.toLong), l.b))
    graph
      .bytes(11, valueInfo("x", Seq(1L, l.inDim.toLong)))
      .bytes(12, valueInfo("y", Seq(1L, l.outDim.toLong)))
    modelBytes(graph)
  }

  test("MatMul(+Add) third-party chain executes with ONNX [in,out] weight orientation") {
    val l = mlp.layers.head
    val viaMatMul = OnnxLinearModel.parseMlp(matmulAddModel(withBias = true))
    val canonical = MlpEmbedder(Seq(l))
    assert(viaMatMul.embedBatch(texts).map(_.toSeq) ==
      canonical.embedBatch(texts).map(_.toSeq))
    // bias-less variant too (pure MatMul)
    val noBias = OnnxLinearModel.parseMlp(matmulAddModel(withBias = false))
    assert(noBias.embedBatch(texts).map(_.toSeq) ==
      MlpEmbedder(Seq(l.copy(b = Array.empty[Float]))).embedBatch(texts).map(_.toSeq))
  }

  /** Single-Gemm model with caller-chosen attributes, W `[out, in]`. */
  private def gemmModel(attrs: Seq[Array[Byte]]): Array[Byte] = {
    val l = mlp.layers.head
    val node = new Writer().str(1, "x").str(1, "W").str(1, "b")
      .str(2, "y").str(3, "gemm").str(4, "Gemm")
    attrs.foreach(a => node.bytes(5, a))
    val graph = new Writer()
      .bytes(1, node.toByteArray)
      .str(2, "thirdparty_gemm")
      .bytes(5, floatTensor("W", Seq(l.outDim.toLong, l.inDim.toLong), l.w))
      .bytes(5, floatTensor("b", Seq(l.outDim.toLong), l.b))
      .bytes(11, valueInfo("x", Seq(1L, l.inDim.toLong)))
      .bytes(12, valueInfo("y", Seq(1L, l.outDim.toLong)))
    modelBytes(graph)
  }

  test("out-of-subset Gemm parameterizations fail loudly, never run mis-scaled") {
    val transA = intercept[IllegalArgumentException] {
      OnnxLinearModel.parseMlp(gemmModel(Seq(
        intAttr("transB", 1L), intAttr("transA", 1L))))
    }
    assert(transA.getMessage.contains("transA"))
    val alpha = intercept[IllegalArgumentException] {
      OnnxLinearModel.parseMlp(gemmModel(Seq(
        intAttr("transB", 1L), floatAttr("alpha", 0.5f))))
    }
    assert(alpha.getMessage.contains("alpha"))
    val beta = intercept[IllegalArgumentException] {
      OnnxLinearModel.parseMlp(gemmModel(Seq(
        intAttr("transB", 1L), floatAttr("beta", 2f))))
    }
    assert(beta.getMessage.contains("alpha/beta"))
  }

  test("explicitly-serialized default attributes are accepted") {
    val m = OnnxLinearModel.parseMlp(gemmModel(Seq(
      intAttr("transB", 1L), intAttr("transA", 0L),
      floatAttr("alpha", 1f), floatAttr("beta", 1f))))
    assert(m.embedBatch(texts).map(_.toSeq) ==
      MlpEmbedder(Seq(mlp.layers.head)).embedBatch(texts).map(_.toSeq))
  }
}
