package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.search.{LinearModelEmbedder, ModelRegistry, SingletonEmbedder, VectorSearchClient}

/** Fixture-weights model lifecycle (VERDICT r5 task 8): the production
  * `Embedder` contract — weights from a checked-in artifact, broadcast to
  * executors, parsed exactly once per JVM — proven end to end with a tiny
  * linear model, no network and no native runtime. A real ONNX deployment
  * swaps the `parse` body; every seam exercised here stays the same.
  */
class LinearModelSpec extends SparkTestBase {

  private val Fixture = "/fixtures/linear_model_v1.txt"

  private def artifact: String = {
    val in = getClass.getResourceAsStream(Fixture)
    assert(in != null, s"$Fixture missing from test classpath")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  test("fixture artifact parses and round-trips through render") {
    val m = LinearModelEmbedder.parse(artifact)
    assert(m.dim == 8 && m.features == 16 && m.w.length == 128)
    val again = LinearModelEmbedder.parse(LinearModelEmbedder.render(m))
    assert(again == m.copy(w = again.w) && again.w.toSeq == m.w.toSeq)
  }

  test("embedding is the normalized matmul of hashed features (replayed)") {
    val m = LinearModelEmbedder.parse(artifact)
    val text = "the quick brown fox the fox"
    val got = m.embedOne(text).toSeq
    // independent replay: featurize + naive matmul + l2 normalize
    val f = m.featurize(text)
    val raw = (0 until m.dim).map { r =>
      (0 until m.features).map(c => m.w(r * m.features + c) * f(c)).sum
    }
    // bit-identical to the impl: float accumulate, then multiply by the
    // float inverse norm (x / doubleNorm would round differently)
    val inv = (1.0 / math.sqrt(raw.map(x => x.toDouble * x.toDouble).sum)).toFloat
    val want = raw.map(_ * inv)
    assert(got == want)
    // unit norm, determinism, token-order insensitivity (bag semantics)
    assert(math.abs(got.map(x => x.toDouble * x.toDouble).sum - 1.0) < 1e-5)
    assert(m.embedOne(text).toSeq == got)
    assert(m.embedOne("fox the quick brown the fox").toSeq == got)
    // null → zero vector (sorts last under cosine distance, contract)
    assert(m.embedOne(null).toSeq == Seq.fill(8)(0.0f))
  }

  test("broadcast weights load once per JVM across 16 partitions and instances") {
    val bc = spark.sparkContext.broadcast(artifact)
    val name = s"linear-${java.util.UUID.randomUUID}"
    val key = s"$name/8"
    val loader = LinearModelEmbedder.broadcastLoader(bc)

    val corpus = spark.range(200)
      .select(col("id"), concat(lit("doc token "), col("id")).as("text"))
      .repartition(16)
    val c1 = VectorSearchClient.fromCorpus(corpus, "text", "id",
      SingletonEmbedder(name, dim = 8, loader = loader))
    c1.searchTopN(Seq("doc token 7"), 3).collect()
    assert(ModelRegistry.loadCount(key) == 1,
      s"expected one parse across 16 partitions, got ${ModelRegistry.loadCount(key)}")

    // a second client for the same model name reuses the parsed handle
    val c2 = VectorSearchClient.fromCorpus(corpus, "text", "id",
      SingletonEmbedder(name, dim = 8, loader = loader))
    c2.searchTopN(Seq("doc token 9"), 3).collect()
    assert(ModelRegistry.loadCount(key) == 1)

    // the singleton path computes exactly what the parsed model computes
    val direct = LinearModelEmbedder.parse(artifact).embedOne("abc").toSeq
    assert(SingletonEmbedder(name, dim = 8, loader = loader).embedOne("abc").toSeq
      == direct)
  }

  test("embeddings are unit-norm and bag-invariant on random texts") {
    val m = LinearModelEmbedder.parse(artifact)
    val rnd = new scala.util.Random(77)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    for (_ <- 1 to 20) {
      val toks = Seq.fill(1 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
      val v = m.embedOne(toks.mkString(" "))
      val n2 = v.map(x => x.toDouble * x.toDouble).sum
      // unit norm unless the hashed features cancel to the zero vector
      assert(n2 == 0.0 || math.abs(n2 - 1.0) < 1e-5, s"norm^2 $n2")
      // bag-of-words: any permutation embeds identically
      val shuffled = rnd.shuffle(toks).mkString(" ")
      assert(m.embedOne(shuffled).toSeq == v.toSeq)
    }
  }

  test("classpath loader ships the model inside the app jar") {
    val name = s"linear-cp-${java.util.UUID.randomUUID}"
    val e = SingletonEmbedder(name, dim = 8,
      loader = LinearModelEmbedder.resourceLoader(Fixture))
    val direct = LinearModelEmbedder.parse(artifact).embedOne("xyz").toSeq
    assert(e.embedOne("xyz").toSeq == direct)
    // dim mismatch fails loudly at load, not with silent garbage
    val bad = SingletonEmbedder(s"$name-bad", dim = 64,
      loader = LinearModelEmbedder.resourceLoader(Fixture))
    intercept[IllegalArgumentException](bad.embedOne("xyz"))
  }
}
