package graft.search

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pluggable text-embedding contract, mirroring the reference's `RuriEmbedder`
  * (reference: model/search/vector.py:40-78): batch-in, batch-out, fixed dim.
  *
  * Implementations MUST be serializable and cheap to construct — one instance
  * is shipped to every executor and `embed` is called once per partition batch
  * (the distributed analogue of the reference's single `model.encode(corpus)`
  * call at vector.py:126). A real model impl should lazily initialize native
  * resources per-JVM (lazy singleton) and broadcast weights.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch of already-prefixed texts. Must be deterministic. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  final def embedOne(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic offline embedder for CI / correctness tests (the environment
  * has no model hub access — SURVEY §7.3 risk 5). Hashes the text into a
  * seeded pseudo-random unit vector: equal texts map to equal vectors, so
  * exact-duplicate semantics survive, and cosine behaves like a real metric
  * over distinct texts (near-orthogonal in expectation).
  */
final case class HashingEmbedder(dim: Int = 8) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val v = new Array[Float](dim)
      var norm = 0.0
      var i = 0
      while (i < dim) {
        val md = MessageDigest.getInstance("MD5")
        md.update(s"graft|$i|".getBytes(StandardCharsets.UTF_8))
        md.update(t.getBytes(StandardCharsets.UTF_8))
        val d = md.digest()
        // first 8 digest bytes -> long -> uniform in [-1, 1)
        var acc = 0L
        var j = 0
        while (j < 8) { acc = (acc << 8) | (d(j) & 0xffL); j += 1 }
        val x = (acc.toDouble / Long.MaxValue.toDouble)
        v(i) = x.toFloat
        norm += x * x
        i += 1
      }
      val inv = if (norm == 0.0) 0.0f else (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) = v(i) * inv; i += 1 }
      v
    }
}
