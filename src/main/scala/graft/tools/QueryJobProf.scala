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
    val cpus = sys.env.getOrElse("QPROF_CPUS", "32").toInt
    val shuffle = sys.env.getOrElse("QPROF_SHUFFLE", cpus.toString).toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", shuffle,
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
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (for {a <- i.submissionTime; b <- i.completionTime}
            yield (b - a) / 1e3).getOrElse(-1.0)
          if (record && wall >= 0.05)
            jobLog.add(f"    stage ${i.stageId}%4d $wall%7.3f s  tasks=${i.numTasks}%-4d ${i.name.take(90)}")
        }
      })

    val runs = sys.env.getOrElse("QPROF_RUNS", "3").toInt
    // QPROF_AB_SHUFFLE=a,b: alternate spark.sql.shuffle.partitions per run
    // (runtime-settable) — intra-JVM A/B of the task-count floor
    val abShuffle = sys.env.get("QPROF_AB_SHUFFLE")
      .map(_.split(",").map(_.trim.toInt).toSeq)
    val names = sys.env.getOrElse("QPROF_QUERIES", "embed_dedup_components")
      .split(",").map(_.trim).filter(_.nonEmpty)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (r <- 1 to runs) {
        record = r == runs && abShuffle.isEmpty
        abShuffle.foreach { vals =>
          val v = vals((r - 1) % vals.size)
          spark.conf.set("spark.sql.shuffle.partitions", v.toString)
        }
        // QPROF_AB_PF: alternate parallelismFirst=false + a small advisory
        // size on even runs (the §2.2 size-governed coalescing posture)
        if (sys.env.contains("QPROF_AB_PF")) {
          val off = r % 2 == 0
          spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            (!off).toString)
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
            if (off) "4m" else "64m")
        }
        val sp = spark.conf.get("spark.sql.shuffle.partitions")
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"  [$name r$r sp=$sp] ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
