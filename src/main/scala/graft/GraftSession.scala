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
  def builder(master: String = "local[32]", shufflePartitions: Int = 32)
      : SparkSession.Builder =
    SparkSession.builder()
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
      // same scan tuning prepare() applies — see its doc
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "8m")

  /** Ensure graft functions exist on a session we did not build (e.g. the
    * driver-made Verify/Bench session), and apply runtime-settable scan
    * tuning: the default file-packing bins (128 MB target, 4 MB per-file
    * open cost) would coalesce a spooled multi-file table back into one
    * scan partition on small test data. 16 MB bins with an 8 MB open cost
    * keep ~2 files per partition; single-file single-row-group tables are
    * unaffected (byte-range splits beyond the one row group are no-ops).
    */
  def prepare(spark: SparkSession): SparkSession = {
    functions.registerAll(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    spark.conf.set("spark.sql.files.openCostInBytes", "8m")
    spark
  }
}
