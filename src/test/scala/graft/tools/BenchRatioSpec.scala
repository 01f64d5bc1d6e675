package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The bench adjudication tooling itself is load-bearing: bench_ratio.py's
  * floor decomposition (real-oracle rows vs floor-dominated rows) is what
  * keeps sub-0.3 s oracle walls from reading as plan defects, and its
  * committed rule caps are the mechanical regression gate for the
  * fixed-cost-dominated queries. Pin the output contract here.
  */
class BenchRatioSpec extends AnyFunSuite {

  private def run(benchJson: String, oracleJson: String): (Int, String) = {
    val dir = java.nio.file.Files.createTempDirectory("bench_ratio_spec")
    val b = dir.resolve("bench.json")
    val o = dir.resolve("oracle.json")
    java.nio.file.Files.writeString(b, benchJson + "\n")
    java.nio.file.Files.writeString(o, oracleJson + "\n")
    val pb = new ProcessBuilder("python3", "tools/bench_ratio.py",
      b.toString, o.toString)
    pb.directory(new java.io.File("/root/repo"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  test("header separates real-oracle rows from floor-dominated rows") {
    // two floor rows (oracle <= 0.3s), one real row under 2x, one real over
    val (code, out) = run(
      """{"metric":"t","value":1,"unit":"sec","queries":{"a":0.5,"b":0.4,"c":1.0,"d":5.0},"sf":0.1}""",
      """{"metric":"t","value":1,"unit":"sec","queries":{"a":0.01,"b":0.3,"c":2.0,"d":2.0},"sf":0.1}""")
    assert(code == 0, out)
    assert(out.contains("real-oracle rows (oracle > 0.3s): 2"), out)
    assert(out.contains("1 > 2x"), out)
    assert(out.contains("floor-dominated rows (oracle <= 0.3s): 2"), out)
  }

  test("a rule-covered query over its committed cap fails mechanically") {
    // streamed_sessions cap is 3.92s (tools/bench_rules.json)
    val (code, out) = run(
      """{"metric":"t","value":1,"unit":"sec","queries":{"streamed_sessions":9.99},"sf":0.1}""",
      """{"metric":"t","value":1,"unit":"sec","queries":{"streamed_sessions":1.0},"sf":0.1}""")
    assert(code != 0, out)
    assert(out.contains("RULE FAIL"), out)
  }

  test("the centrality composites are rule-covered") {
    val (code, out) = run(
      """{"metric":"t","value":1,"unit":"sec","queries":{"central_rep_docs":2.9,"central_dedup_survivors":2.8},"sf":0.1}""",
      """{"metric":"t","value":1,"unit":"sec","queries":{"central_rep_docs":1.5,"central_dedup_survivors":1.5},"sf":0.1}""")
    assert(code == 0, out)
    assert(out.contains("PASS") && out.contains("central_rep_docs"), out)
    assert(out.contains("central_dedup_survivors"), out)
  }
}
