package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** `SparkSessionExtensions` hook: makes graft's SQL functions available via
  * `spark.sql.extensions=graft.GraftExtensions` — the idiomatic cluster-wide
  * injection path (no code change for SQL-only users).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    functions.injectable.foreach(e.injectFunction)
    // opt-in ANN index substitution (off unless spark.graft.ann.autoProbe
    // is set AND an index is registered in graft.plans.AnnCatalog)
    e.injectOptimizerRule(session => graft.plans.AnnProbeRule(session))
  }
}

/** Session factory with graft defaults. Local-mode knobs match the test
  * environment (32 threads); on a real cluster only the SQL confs apply.
  */
object GraftSession {
  /** @param tuneSmallFileScans opt-in SMALL-DATA scan tuning (see
    *   [[tuneForSmallFiles]]) for test/bench sessions. Leave false for
    *   production: at real (100 TB) scale Spark's default 128 MB bins are
    *   right, and 16 MB bins would mean ~8x the scan-task count for pure
    *   scheduler overhead.
    */
  def builder(master: String = "local[32]", shufflePartitions: Int = 32,
      tuneSmallFileScans: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // single-node bench posture: mid-size dimension tables (orders at
      // sf0.1, shingle dictionaries) should broadcast rather than shuffle
      // the big fact side; on a real cluster executors have >= this much
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    if (tuneSmallFileScans)
      b.config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "8m")
    else b
  }

  /** Runtime-settable scan tuning for SMALL test data only: the default
    * file-packing bins (128 MB target, 4 MB per-file open cost) would
    * coalesce a spooled multi-file table back into one scan partition at
    * sf0.01/0.1. 16 MB bins with an 8 MB open cost keep ~2 files per
    * partition; single-file single-row-group tables are unaffected
    * (byte-range splits beyond the one row group are no-ops). Never apply
    * to a production session — see [[builder]]'s scaladoc.
    */
  def tuneForSmallFiles(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    spark.conf.set("spark.sql.files.openCostInBytes", "8m")
    spark
  }

  /** Ensure graft functions exist on a session we did not build (e.g. the
    * driver-made Verify/Bench session) and apply the small-file scan
    * tuning — this entrypoint is for the TEST/BENCH path only; production
    * sessions use [[builder]] (default: no small-file tuning).
    */
  def prepare(spark: SparkSession): SparkSession = {
    functions.registerAll(spark)
    attachAnnProbeRule(spark)
    tuneForSmallFiles(spark)
  }

  /** Attach the opt-in ANN plan-substitution rule to a session built
    * WITHOUT `GraftExtensions` (the extensions path injects it at build
    * time; a foreign session only has the public experimental hook).
    * Idempotent, and inert until `spark.graft.ann.autoProbe=true` AND an
    * index is registered — same double gate as the extensions path.
    */
  def attachAnnProbeRule(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.AnnProbeRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AnnProbeRule(spark)
}
