package graft.tools

/** Scratch per-query job profiler (r20): run declared queries from
  * SparkEntry with the noop sink N times and print, for the LAST (warm)
  * run, every Spark job's wall and call site — attributes a query's cost
  * to the driver-blocking actions and AQE stage jobs that compose it.
  * Usage: QPROF_QUERIES=embed_dedup_components,semantic_dedup
  *        QPROF_RUNS=3 sbt "runMain graft.tools.QueryJobProf"
  */
object QueryJobProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32,
      tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties).flatMap(p =>
              Option(p.getProperty("callSite.short"))).getOrElse("?")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = starts.getOrDefault(j.jobId, (0L, "?"))
          if (record)
            jobLog.add(f"    job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
        }
      })

    val runs = sys.env.getOrElse("QPROF_RUNS", "3").toInt
    val names = sys.env.getOrElse("QPROF_QUERIES", "embed_dedup_components")
      .split(",").map(_.trim).filter(_.nonEmpty)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (r <- 1 to runs) {
        record = r == runs
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"  [$name r$r] ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      Thread.sleep(400) // async listener bus tail
      record = false
      var s = jobLog.poll()
      while (s != null) { println(s); s = jobLog.poll() }
      spark.catalog.clearCache()
      spark.conf.set(graft.plans.AnnProbeRule.ConfKey, "false")
      graft.plans.AnnCatalog.clear()
    }
    spark.stop()
  }
}
