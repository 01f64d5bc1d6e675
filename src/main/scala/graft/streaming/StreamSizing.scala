package graft.streaming

import org.apache.spark.sql.SparkSession

/** Query-scoped sizing for streaming state.
  *
  * A stateful streaming query's state-partition count IS
  * `spark.sql.shuffle.partitions` at first start: it is recorded in the
  * query's offset log and enforced on every restart, independent of the
  * session default from then on. That makes it a PER-QUERY sizing
  * decision — a high-volume ingest wants hundreds of state partitions, a
  * low-key-cardinality sessionization wants few (each partition pays a
  * state-store instance plus per-micro-batch checkpoint file ops, a fixed
  * cost that dwarfs the data work when keys are few) — and the session
  * default (sized for the BATCH tier's shuffles) is the wrong number for
  * both.
  */
object StreamSizing {

  /** Run `start` (typically a `writeStream...start()` call) with the
    * session's shuffle-partition count set to `n`, restoring the previous
    * value before returning. Safe for the running query: `StreamExecution`
    * clones the session when the query starts, so the restore does not
    * touch the clone — the query keeps `n` for its lifetime (and its
    * checkpoint pins it for restarts).
    *
    * The session conf is process-visible while `start` runs, so callers
    * that plan OTHER queries concurrently on the same session must
    * serialize around this (the gate harnesses are single-threaded; a
    * production driver starting many streams sizes each inside its own
    * call).
    */
  def withStatePartitions[A](spark: SparkSession, n: Int)(start: => A): A = {
    require(n > 0, s"state partitions must be positive: $n")
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try start finally spark.conf.set(key, old)
  }
}
