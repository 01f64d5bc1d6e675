package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Inline data-quality metrics via `Dataset.observe` (O1 observability).
  *
  * A 100 TB ingest can't afford a second pass to learn it just wrote 4%
  * null texts: `observe` accumulates metric expressions inside the SAME
  * job that materializes the frame — zero extra scans, exact counts, and
  * the numbers arrive on the driver when the action completes. This is the
  * production pattern for corpus-ingest gates: compute the corpus AND its
  * health certificate in one pass, then fail the pipeline (not the data)
  * if the certificate is out of bounds.
  */
object PipelineMetrics {

  /** Attach corpus-health metrics to a document frame. Returns the
    * instrumented frame plus the [[Observation]] handle; run any action on
    * the frame, then `observation.get` yields the metrics row
    * (n_rows, null_texts, empty_texts, avg_chars, distinct-ish doc sample).
    */
  def observeCorpus(df: DataFrame, textCol: String = "text",
      name: String = "graft_corpus"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val instrumented = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("null_texts"),
      sum(when(length(col(textCol)) === 0, 1L).otherwise(0L)).as("empty_texts"),
      avg(length(col(textCol))).as("avg_chars"),
      // exact byte-ish volume counter (UTF-16 chars; deterministic, unlike
      // avg_chars' float) — the per-stage certificate the gate query emits
      sum(coalesce(length(col(textCol)).cast("long"), lit(0L))).as("total_chars"))
    (instrumented, obs)
  }

  /** Gate helper: throws if the observed null/empty fraction exceeds
    * `maxBadFraction`. Call AFTER an action has run on the instrumented
    * frame (`Observation.get` blocks until then).
    */
  def assertHealthy(obs: Observation, maxBadFraction: Double): Unit = {
    val m = obs.get
    val n = m("n_rows").asInstanceOf[Long]
    val bad = m("null_texts").asInstanceOf[Long] + m("empty_texts").asInstanceOf[Long]
    require(n == 0 || bad.toDouble / n <= maxBadFraction,
      s"corpus health gate failed: $bad of $n rows null/empty " +
        s"(max allowed fraction $maxBadFraction)")
  }
}
