package graft.search

/** Small multi-layer-perceptron embedder — the step past
  * [[LinearModelEmbedder]] toward the reference's real sentence-transformer
  * (model/search/vector.py:41-78): `embed(text) =
  * l2norm(W_L(...relu(W_1·f(text) + b_1)...) + b_L)` with the same signed
  * feature-hashing input layer ([[FeatureHash]] — shared so the two model
  * families agree on the text→vector contract).
  *
  * Same [[Embedder]] lifecycle as the linear model: loaded once per JVM
  * through [[ModelRegistry]], broadcast-friendly, deterministic, null →
  * zero vector. Weights execute from a real ONNX artifact via
  * [[OnnxLinearModel.parseMlp]] (a Gemm/MatMul→Add→Relu chain); attention
  * blocks execute through [[OnnxTransformer]]'s dataflow subset, leaving
  * real pretrained models as the cutoff where an actual ONNX runtime
  * would slot in behind the same `(name, dim) => Embedder` signature.
  */
final case class MlpLayer(outDim: Int, inDim: Int, w: Array[Float],
    b: Array[Float]) {
  require(w.length == outDim * inDim,
    s"layer weight ${w.length} != $outDim x $inDim")
  require(b.isEmpty || b.length == outDim,
    s"layer bias ${b.length} != out dim $outDim")
}

final case class MlpEmbedder(layers: Seq[MlpLayer]) extends Embedder {
  require(layers.nonEmpty, "MLP needs at least one layer")
  layers.sliding(2).foreach {
    case Seq(a, b) => require(a.outDim == b.inDim,
      s"layer dims do not chain: ${a.outDim} -> ${b.inDim}")
    case _ => ()
  }

  /** Output dimensionality (last layer); input features (first layer). */
  def dim: Int = layers.last.outDim
  def features: Int = layers.head.inDim

  private def matmulBias(l: MlpLayer, x: Array[Float]): Array[Float] = {
    val out = new Array[Float](l.outDim)
    var r = 0
    while (r < l.outDim) {
      var acc = if (l.b.isEmpty) 0.0f else l.b(r)
      var c = 0
      val base = r * l.inDim
      while (c < l.inDim) { acc += l.w(base + c) * x(c); c += 1 }
      out(r) = acc
      r += 1
    }
    out
  }

  /** Raw vector forward — the matmul chain with relu between layers, NO
    * text hashing and NO final l2 normalization: the reusable numeric
    * core for non-text consumers (the ONNX-backed media codec). With
    * integer-valued inputs and integer weights every float op here is
    * EXACT as long as intermediate magnitudes stay below 2^24, which is
    * what makes such consumers SQL-oracle-replicable in integer
    * arithmetic.
    */
  def forward(x: Array[Float]): Array[Float] = {
    require(x.length == features,
      s"forward: input dim ${x.length} != model features $features")
    var h = x
    var i = 0
    while (i < layers.length) {
      h = matmulBias(layers(i), h)
      if (i < layers.length - 1) {
        var j = 0
        while (j < h.length) { if (h(j) < 0f) h(j) = 0f; j += 1 }
      }
      i += 1
    }
    h
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      if (t == null) new Array[Float](dim)
      else {
        val h = forward(FeatureHash(t, features))
        var norm = 0.0
        var j = 0
        while (j < h.length) { norm += h(j).toDouble * h(j).toDouble; j += 1 }
        if (norm > 0.0) {
          val inv = (1.0 / math.sqrt(norm)).toFloat
          j = 0
          while (j < h.length) { h(j) *= inv; j += 1 }
        }
        h
      }
    }
}
