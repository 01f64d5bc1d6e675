package graft.search

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pluggable text-embedding contract, mirroring the reference's `RuriEmbedder`
  * (reference: model/search/vector.py:40-78): batch-in, batch-out, fixed dim.
  *
  * Implementations MUST be serializable and cheap to construct — one instance
  * is shipped to every executor and `embedBatch` is called once per partition
  * batch (the distributed analogue of the reference's single
  * `model.encode(corpus)` call at vector.py:126). A real model impl should
  * lazily initialize native resources per-JVM (lazy singleton) and broadcast
  * weights.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch of already-prefixed texts. Must be deterministic.
    * Null texts map to the zero vector (cosine distance 2.0 — sorts last).
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  final def embedOne(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic offline embedder for CI / correctness tests (the environment
  * has no model hub access — SURVEY §7.3 risk 5). Hashes the text ONCE into a
  * 128-bit seed, then expands to `dim` floats with splitmix64 — one digest per
  * text, not per (text × dim) (round-1 ADVICE perf fix). Equal texts map to
  * equal vectors, so exact-duplicate semantics survive, and cosine behaves
  * like a real metric over distinct texts (near-orthogonal in expectation).
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  import graft.util.Hashing.splitmix64

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val md = MessageDigest.getInstance("MD5") // one instance per batch, reset between texts
    texts.map { t =>
      val v = new Array[Float](dim)
      if (t == null) return0(v) else {
        md.reset()
        md.update("graft|".getBytes(StandardCharsets.UTF_8))
        md.update(t.getBytes(StandardCharsets.UTF_8))
        val d = md.digest()
        var seed = 0L
        var j = 0
        while (j < 8) { seed = (seed << 8) | (d(j) & 0xffL); j += 1 }
        var norm = 0.0
        var i = 0
        var s = seed
        while (i < dim) {
          s = splitmix64(s)
          val x = s.toDouble / Long.MaxValue.toDouble // uniform in [-1, 1]
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
  }

  private def return0(v: Array[Float]): Array[Float] = v // zero vector for null text
}

/** Per-JVM model-handle registry: the executor half of a real model
  * embedder. The reference loads its SentenceTransformer once per process
  * and reuses it for every encode call (model/search/vector.py:41-62,
  * `@classmethod from_*` construct-once); the distributed analogue is a
  * load-once-per-EXECUTOR singleton — an `Embedder` instance is shipped to
  * every task, but the expensive handle (native weights, tokenizer) must be
  * materialized exactly once per JVM no matter how many partitions run
  * there. `computeIfAbsent` gives that guarantee under concurrent tasks.
  */
object ModelRegistry {
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[String, Embedder]()
  private val loads =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def getOrLoad(key: String)(load: () => Embedder): Embedder =
    handles.computeIfAbsent(key, { _ =>
      loads.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicInteger)
        .incrementAndGet()
      load()
    })

  /** How many times `key`'s loader actually ran in this JVM (observability +
    * the singleton-contract spec).
    */
  def loadCount(key: String): Int = {
    val c = loads.get(key)
    if (c == null) 0 else c.get()
  }
}

/** Embedder whose model handle is resolved lazily through [[ModelRegistry]]:
  * what ships to executors is only (modelName, dim, loader); the handle
  * itself is created once per JVM on first use. A real deployment points
  * `loader` at actual weight loading; offline it wraps [[HashingEmbedder]]
  * (no model hub in this environment — SURVEY §7.3 risk 5).
  */
final case class SingletonEmbedder(
    modelName: String,
    dim: Int = 64,
    loader: (String, Int) => Embedder = SingletonEmbedder.defaultLoader)
    extends Embedder {

  @transient private lazy val handle: Embedder =
    ModelRegistry.getOrLoad(s"$modelName/$dim")(() => loader(modelName, dim))

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    handle.embedBatch(texts)
}

object SingletonEmbedder {
  /** Offline stand-in load: deterministic hashing model. */
  val defaultLoader: (String, Int) => Embedder = (_, dim) => HashingEmbedder(dim)
}
