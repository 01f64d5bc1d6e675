package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time a subset of SparkEntry.queries at a given SF dir.
  * Usage: sbt "Test/runMain graft.tools.TimeSome <sfdir> <query1> ..."
  * (test scope: a benchmarking scratchpad is not library surface).
  */
object TimeSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    // warmup
    try {
      graft.SparkEntry.queries("search_topk")(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    } catch { case scala.util.control.NonFatal(_) => () }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      spark.catalog.clearCache()
      println(f"TIMING $n%s $best%.3f s")
    }
    spark.stop()
  }
}
