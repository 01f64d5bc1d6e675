package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.broadcast.Broadcast

import graft.util.Hashing.splitmix64

/** Tiny ONNX-free linear embedding model: the production `Embedder`
  * lifecycle (weights from an artifact, broadcast to executors, parsed once
  * per JVM through [[ModelRegistry]]) proven end to end without any network
  * or native runtime. The reference's real model is a SentenceTransformer
  * loaded once per process (reference: model/search/vector.py:41-62); this
  * is the same contract with the matmul small enough to replay in a spec.
  *
  * `embed(text) = l2normalize(W * features(text))` where `features` is a
  * signed-feature-hashing bag of whitespace tokens (the classic hashing
  * trick): token t adds ±1 to component `floorMod(mix(t), features)`, sign
  * from another bit of the same mix. Deterministic, order-insensitive,
  * equal texts → equal vectors; null → the zero vector (dist 2.0, sorts
  * last — the [[Embedder]] contract).
  *
  * Weight artifact format (`graft-linear-v1`, text so the fixture is
  * diffable in review):
  * {{{
  *   graft-linear-v1 <dim> <features>
  *   <features floats>   // row 0 of W (output component 0)
  *   ...                 // dim rows total, row-major
  * }}}
  */
final case class LinearModelEmbedder(dim: Int, features: Int, w: Array[Float])
    extends Embedder {
  require(w.length == dim * features,
    s"weight matrix ${w.length} != dim $dim x features $features")

  /** Signed hashing-trick feature vector of one text. */
  def featurize(text: String): Array[Float] = FeatureHash(text, features)

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val out = new Array[Float](dim)
      if (t != null) {
        val f = featurize(t)
        var r = 0
        var norm = 0.0
        while (r < dim) {
          var acc = 0.0f
          var c = 0
          val base = r * features
          while (c < features) { acc += w(base + c) * f(c); c += 1 }
          out(r) = acc
          norm += acc.toDouble * acc.toDouble
          r += 1
        }
        if (norm > 0.0) {
          val inv = (1.0 / math.sqrt(norm)).toFloat
          r = 0
          while (r < dim) { out(r) *= inv; r += 1 }
        }
      }
      out
    }
}

/** The signed hashing-trick bag-of-tokens featurizer, shared by every
  * model whose input layer consumes text (linear and MLP embedders must
  * agree on it exactly — the feature map is part of the model contract).
  */
private[search] object FeatureHash {
  def apply(text: String, features: Int): Array[Float] = {
    val f = new Array[Float](features)
    var i = 0
    val toks = text.split("\\s+")
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = splitmix64(toks(i).hashCode.toLong)
        val idx = java.lang.Math.floorMod(h, features.toLong).toInt
        val sign = if ((h >>> 32 & 1L) == 0L) 1.0f else -1.0f
        f(idx) += sign
      }
      i += 1
    }
    f
  }
}

object LinearModelEmbedder {

  private val Magic = "graft-linear-v1"

  /** Parse the `graft-linear-v1` text artifact. */
  def parse(artifact: String): LinearModelEmbedder = {
    val tok = artifact.trim.split("\\s+")
    require(tok.length >= 3 && tok(0) == Magic,
      s"not a $Magic artifact (starts '${artifact.take(32)}')")
    val dim = tok(1).toInt
    val features = tok(2).toInt
    val floats = tok.drop(3)
    require(floats.length == dim * features,
      s"$Magic header says $dim x $features but ${floats.length} floats follow")
    LinearModelEmbedder(dim, features, floats.map(_.toFloat))
  }

  /** Render a model back to the artifact text (round-trip with [[parse]]). */
  def render(m: LinearModelEmbedder): String = {
    val rows = (0 until m.dim).map { r =>
      (0 until m.features)
        .map(c => m.w(r * m.features + c).toString).mkString(" ")
    }
    (s"$Magic ${m.dim} ${m.features}" +: rows).mkString("\n") + "\n"
  }

  /** Loader reading the artifact from a filesystem path visible to every
    * executor (shared storage / cluster deploy dir). The parse runs once
    * per JVM — [[SingletonEmbedder]] routes it through [[ModelRegistry]].
    */
  def fileLoader(path: String): (String, Int) => Embedder = (_, d) => {
    val m = parse(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8))
    require(m.dim == d, s"artifact dim ${m.dim} != requested $d")
    m
  }

  /** Loader reading the artifact from the application classpath (the model
    * shipped inside the app jar — no shared filesystem needed).
    */
  def resourceLoader(resource: String): (String, Int) => Embedder = (_, d) => {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"model resource $resource not on classpath")
    val bytes = try in.readAllBytes() finally in.close()
    val m = parse(new String(bytes, StandardCharsets.UTF_8))
    require(m.dim == d, s"artifact dim ${m.dim} != requested $d")
    m
  }

  /** Loader deserializing broadcast weights: the driver reads the artifact
    * once, Spark's torrent broadcast ships it to each executor once (NOT
    * once per task — the point of broadcasting weights), and the parse
    * still runs once per JVM via the registry.
    */
  def broadcastLoader(bc: Broadcast[String]): (String, Int) => Embedder =
    (_, d) => {
      val m = parse(bc.value)
      require(m.dim == d, s"artifact dim ${m.dim} != requested $d")
      m
    }
}
