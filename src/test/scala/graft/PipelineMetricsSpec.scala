package graft

import org.apache.spark.sql.functions._

import graft.ops.PipelineMetrics

/** observe()-based metrics: exact counts piggyback on the consuming job
  * (no second scan), and the health gate trips on bad fractions.
  */
class PipelineMetricsSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def corpus = Seq(
    (1L, "a fine document"), (2L, ""), (3L, null.asInstanceOf[String]),
    (4L, "another one"), (5L, "more text here")
  ).toDF("doc_id", "text")

  test("metrics arrive with the consuming action, no second pass") {
    val (df, obs) = PipelineMetrics.observeCorpus(corpus)
    val n = df.where(col("doc_id") > 0).count() // the ONE action
    assert(n == 5)
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("null_texts") == 1L)
    assert(m("empty_texts") == 1L)
  }

  test("health gate passes within bounds and trips beyond them") {
    val (df, obs) = PipelineMetrics.observeCorpus(corpus, name = "gate_ok")
    df.write.format("noop").mode("overwrite").save()
    PipelineMetrics.assertHealthy(obs, maxBadFraction = 0.5) // 2/5 bad, ok
    val (df2, obs2) = PipelineMetrics.observeCorpus(corpus, name = "gate_bad")
    df2.write.format("noop").mode("overwrite").save()
    assertThrows[IllegalArgumentException] {
      PipelineMetrics.assertHealthy(obs2, maxBadFraction = 0.1)
    }
  }
}
