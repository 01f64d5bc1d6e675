package graft.tools

import java.nio.file.{Files, Paths}

import graft.search.{LinearModelEmbedder, MlpEmbedder, MlpLayer, OnnxLinearModel}
import graft.util.Hashing.splitmix64

/** Regenerates the checked-in ONNX fixtures from their deterministic
  * sources, so review can diff bytes instead of trusting a binary:
  *
  *   sbt "Test/runMain graft.tools.OnnxFixtures"
  *
  * writes `src/test/resources/fixtures/tiny_linear.onnx` (from the
  * `linear_model_v1.txt` text artifact) and `tiny_mlp.onnx` (from
  * [[tinyMlp]]). LinearModelSpec asserts the checked-in bytes equal the
  * writers' output, so a writer change without regeneration fails loudly.
  */
object OnnxFixtures {

  /** Deterministic 2-layer MLP: 16 features → 12 hidden (Relu) → 8 out.
    * Weights/biases from the splitmix64 stream, small enough to replay by
    * hand in the spec.
    */
  def tinyMlp: MlpEmbedder = {
    def f(seed: Long, n: Int): Array[Float] =
      Array.tabulate(n)(i =>
        ((splitmix64(seed + i) % 1000L) / 1000.0f) - 0.5f)
    MlpEmbedder(Seq(
      MlpLayer(12, 16, f(0xA1L, 12 * 16), f(0xB1L, 12)),
      MlpLayer(8, 12, f(0xA2L, 8 * 12), f(0xB2L, 8))))
  }

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/fixtures")
    val text = new String(Files.readAllBytes(dir.resolve("linear_model_v1.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    Files.write(dir.resolve("tiny_linear.onnx"),
      OnnxLinearModel.toBytes(LinearModelEmbedder.parse(text)))
    Files.write(dir.resolve("tiny_mlp.onnx"),
      OnnxLinearModel.toMlpBytes(tinyMlp))
    println(s"wrote ${dir.resolve("tiny_linear.onnx")} and tiny_mlp.onnx")
  }
}
