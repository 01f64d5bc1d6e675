package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the streamed gates (optimization-round
  * measurement; mirrors the registered query bodies with nanoTime around
  * each phase). Not part of the library surface.
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32,
      tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import spark.implicits._

    def ph[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$name] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // per-job breakdown (PROF_JOBS=1): which driver-blocking jobs a phase
    // pays, with wall per job — the guide-§1 measurement for the per-epoch
    // job-chain candidate (r20 #1)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (sys.env.contains("PROF_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              Option(j.properties).flatMap(p =>
                Option(p.getProperty("callSite.short"))
                  .orElse(Option(p.getProperty("spark.job.description"))))
                .getOrElse("?")))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, d) = starts.getOrDefault(j.jobId, (0L, "?"))
            jobLog.add(f"    job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
          }
        })
    def drainJobs(): Unit = {
      Thread.sleep(300) // listener bus is async; let tail events land
      var s = jobLog.poll()
      while (s != null) { println(s); s = jobLog.poll() }
    }

    val parts = sys.env.getOrElse("PROF_PARTS", "8").toInt
    val gate = sys.env.getOrElse("PROF_GATE", "sessions")

    if (gate == "components") {
      for (round <- 1 to 2) {
        println(s"== streamed_components round $round")
        val d = ph("docs") {
          graft.SparkEntry.queries // touch
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text"))
        }
        def shingle(f: DataFrame): DataFrame =
          f.select(col("doc_id"),
            graft.ops.TextOps.wordNGrams(col("text"), 3).as("sh"))
        val state = ph("clusterState") {
          graft.streaming.CorpusIngest.clusterState(
            shingle(d.where(pmod(col("doc_id"), lit(2)) === 0)),
            "doc_id", "sh", 0.5)
        }
        val epochs = ph("collect-epochs") {
          Seq(1L, 3L).map(m =>
            d.where(pmod(col("doc_id"), lit(4)) === m)
              .as[(Long, String)].collect().toSeq)
        }
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)](spark)
        val q = ph("start") {
          graft.streaming.StreamSizing.withStatePartitions(spark, parts) {
            graft.streaming.CorpusIngest.clusteredIngest(
              shingle(stream.toDF().toDF("doc_id", "text")), state,
              "doc_id", "sh", 0.5)((_, _) => ())
          }
        }
        try {
          var i = 0
          drainJobs()
          epochs.foreach { e =>
            i += 1
            ph(s"epoch$i") { stream.addData(e); q.processAllAvailable() }
            drainJobs()
          }
        } finally ph("stop") { q.stop() }
        ph("readback") {
          state.currentLabels.orderBy(col("doc_id"))
            .write.format("noop").mode("overwrite").save()
        }
        drainJobs()
      }
      spark.stop(); return
    }
    if (gate == "fileingest") {
      for (round <- 1 to 2) {
        println(s"== streamed_file_ingest_survivors round $round")
        val d = ph("docs") {
          graft.SparkEntry.queries // touch
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text"))
        }
        def shingle(f: DataFrame): DataFrame =
          f.select(col("doc_id"),
            graft.ops.TextOps.wordNGrams(col("text"), 3).as("sh"))
        val corpus = ph("corpus-pin") {
          val c = shingle(d.where(pmod(col("doc_id"), lit(2)) === 0))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          c
        }
        val src = graft.util.TempDirs.create("prof_file_src")
        val ckpt = graft.util.TempDirs.create("prof_file_ckpt")
        val out = graft.util.TempDirs.create("prof_file_out")
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        def drainEpoch(m: Long): Unit = {
          ph(s"land-file m=$m") {
            d.where(pmod(col("doc_id"), lit(4)) === m)
              .coalesce(1).write.mode("append").parquet(src)
          }
          val q = ph(s"start m=$m") {
            graft.streaming.StreamSizing.withStatePartitions(spark, parts) {
              graft.streaming.CorpusIngest.dedupedIngest(
                  shingle(spark.readStream.schema(schema).parquet(src)), corpus,
                  "doc_id", "sh", 0.5, checkpoint = Some(ckpt),
                  trigger = Some(org.apache.spark.sql.streaming.Trigger
                    .AvailableNow())) { (survivors, _) =>
                survivors.select("doc_id").write.mode("append").parquet(out)
              }
            }
          }
          try ph(s"drain m=$m") { q.awaitTermination() }
          finally ph(s"stop m=$m") { q.stop() }
          q.recentProgress.foreach { p =>
            println(s"    batch=${p.batchId} rows=${p.numInputRows} " +
              s"durationMs=${p.durationMs}")
          }
          drainJobs()
        }
        drainEpoch(1)
        drainEpoch(3)
        ph("readback") {
          spark.read.parquet(out).orderBy(col("doc_id"))
            .write.format("noop").mode("overwrite").save()
        }
        corpus.unpersist(blocking = false)
      }
      spark.stop(); return
    }
    // batch twin: how much of the epoch is streaming machinery vs the agg?
    locally {
      val ev = graft.SparkEntry.eventsTable(spark, dir)
        .select(col("ts"), col("user_id"), col("value"))
        .withColumn("value", col("value").cast("decimal(18,2)"))
      ph("batch-twin sessionize") {
        ev.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), sum(col("value")).as("v"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    for (round <- 1 to 2) {
      println(s"== streamed_sessions round $round parts=$parts")
      val rows = ph("collect-events") {
        graft.SparkEntry.eventsTable(spark, dir)
          .select(col("ts"), col("user_id"), col("value"))
          .as[(java.sql.Timestamp, Long, Double)].collect().toSeq
      }
      val maxTs = rows.iterator.map(_._1.getTime).max
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long, Double)](spark)
      val out = graft.util.TempDirs.create("prof_sessions")
      val sessions = graft.streaming.EventStreams.sessionize(
        stream.toDF().toDF("ts", "user_id", "value")
          .withColumn("value", col("value").cast("decimal(18,2)")))
      // PROF_STORE=rocksdb: measure the RocksDB state-store provider vs the
      // default HDFS-backed one for the session_window aggregate (r20
      // measurement item; the provider is pinned per-query at first start
      // via the cloned session, so the scoped set/restore is safe — the
      // same mechanism withStatePartitions uses)
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProvider = spark.conf.getOption(providerKey)
      if (sys.env.get("PROF_STORE").contains("rocksdb"))
        spark.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val q = ph("start") {
        try graft.streaming.StreamSizing.withStatePartitions(spark, parts) {
          sessions.writeStream.outputMode("append")
            .option("checkpointLocation",
              graft.util.TempDirs.create("prof_sessions_ckpt"))
            .foreachBatch { (b: DataFrame, _: Long) =>
              (if (sys.env.contains("PROF_COALESCE")) b.coalesce(1) else b)
                .write.mode("append").parquet(out)
            }
            .start()
        } finally prevProvider match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None => spark.conf.unset(providerKey)
        }
      }
      try {
        ph("epoch1") { stream.addData(rows); q.processAllAvailable() }
        ph("sentinel") {
          stream.addData(Seq((new java.sql.Timestamp(
            maxTs + 10L * 86400L * 1000L), -1L, 0.0)))
          q.processAllAvailable()
        }
      } finally ph("stop") { q.stop() }
      q.recentProgress.foreach { p =>
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state=${p.stateOperators.toSeq.map(s =>
            s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}")}")
      }
      ph("readback") {
        spark.read.parquet(out)
          .select(col("session_start"), col("session_end"), col("user_id"),
            col("n_events"), col("session_value").cast("double")
              .as("session_value"))
          .orderBy(col("user_id"), col("session_start"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
