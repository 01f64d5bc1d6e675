package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{Dedup, TextOps}

/** Scratch INTRA-JVM A/B for the r20 postings-state experiment (REJECTED —
  * numbers below): the r19 per-epoch pipeline shapes vs a restructure that
  * holds the corpus as a pinned, hash(__sh)-partitioned exploded-postings
  * frame and the batch as one pinned postings view shared by the self- and
  * cross-joins. Interleaved in ONE JVM because window noise between
  * separate bench JVMs measured 30%+ on the streamed gates — far above the
  * effect size either way.
  *
  * Result (sf0.1, local[32], interleaved r3/r4 after warmup):
  *   ingest epoch  old 1.17-1.19 s vs new 1.24-1.32 s (ex 11 -> 13)
  *   cluster epoch old 2.20-2.64 s vs new 2.56-2.70 s
  * The postings pin saves the per-epoch corpus explode (~0.3 s measured by
  * AgainstProf) but pays it back: an extra repartition exchange feeding the
  * pin, a stats-less checkpointed batch-postings frame where the r19 shape
  * let AQE see fresh estimates, and one more exchange in the composite.
  * Matches AgainstProf's r19 "net ~0, not taken" verdict — kept rejected.
  * (The postings shapes are reconstructed inline here so the experiment
  * stays runnable without carrying the rejected library surface.)
  */
object ChainProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32,
      tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def ph(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val p = df.queryExecution.executedPlan
      def cnt(s: String) = p.toString.split("\n").count(_.contains(s))
      println(f"  [$name] $t%.3f s  ex=${cnt("Exchange")} bhj=${cnt("BroadcastHashJoin")} smj=${cnt("SortMergeJoin")}")
    }

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def shingle(f: DataFrame): DataFrame =
      f.select(col("doc_id"), TextOps.wordNGrams(col("text"), 3).as("sh"))
    val corpus = shingle(d.where(pmod(col("doc_id"), lit(2)) === 0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val batch = shingle(d.where(pmod(col("doc_id"), lit(4)) === 1)).localCheckpoint()

    // postings layout: (id-as-"b", size_b, __sh) — the materializePostings
    // convention (inlined; the experiment's library surface was not kept)
    def postingsOf(f: DataFrame): DataFrame = f
      .select(col("doc_id").as("__id"), array_distinct(col("sh")).as("__arr"))
      .withColumn("__sz", size(col("__arr")).cast("long"))
      .where(col("__sz") > 0)
      .select(col("__id").as("b"), col("__sz").as("size_b"),
        explode(col("__arr")).as("__sh"))
    def pairCore(l: DataFrame, r: DataFrame, tau: Double,
        ordered: Boolean): DataFrame =
      l.join(r, "__sh")
        .where((if (ordered) col("a") < col("b") else lit(true)) &&
          col("size_b") >= ceil(lit(tau) * col("size_a")) &&
          col("size_a") >= ceil(lit(tau) * col("size_b")))
        .groupBy("a", "b", "size_a", "size_b")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") /
            (col("size_a") + col("size_b") - col("inter")).cast("double"))
        .where(col("jaccard") >= tau)
        .select("a", "b", "inter", "size_a", "size_b", "jaccard")
    def asProbe(p: DataFrame): DataFrame =
      p.select(col("__sh"), col("b").as("a"), col("size_b").as("size_a"))

    // ---- ingest epoch (processBatch shape) --------------------------------
    def ingestOld(): DataFrame = {
      val withinPairs = Dedup.jaccardJoin(
        batch.select("doc_id", "sh"), "doc_id", "sh", 0.5)
      val withinSurvivors = Dedup.survivors(batch, "doc_id", withinPairs)
      val crossPairs = Dedup.jaccardJoinAgainst(
        withinSurvivors.select("doc_id", "sh"), corpus, "doc_id", "sh", 0.5)
      Dedup.incrementalSurvivors(withinSurvivors, "doc_id", crossPairs)
    }
    lazy val corpusPostings = postingsOf(corpus)
      .repartition(col("__sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def ingestNew(): DataFrame = {
      val bpost = postingsOf(batch).persist(StorageLevel.MEMORY_AND_DISK)
      val withinPairs = pairCore(asProbe(bpost), bpost, 0.5, ordered = true)
      val withinSurvivors = Dedup.survivors(batch, "doc_id", withinPairs)
      val survPost = bpost.join(
        withinPairs.select(col("b")).distinct(), Seq("b"), "left_anti")
      val crossPairs = pairCore(asProbe(survPost), corpusPostings, 0.5,
        ordered = false)
      val out = Dedup.incrementalSurvivors(withinSurvivors, "doc_id", crossPairs)
      graft.ops.FixpointPin.retire(bpost)
      out
    }

    // ---- cluster epoch (clusterBatch shape, one epoch against the corpus) --
    lazy val labels = Dedup.components(
      Dedup.jaccardJoin(corpus, "doc_id", "sh", 0.5).select("a", "b"),
      "doc_id").localCheckpoint()
    def clusterOld(): DataFrame = {
      val bsh = batch.select("doc_id", "sh").localCheckpoint()
      val newPairs = Dedup.jaccardJoin(bsh, "doc_id", "sh", 0.5)
        .select("a", "b")
        .unionAll(Dedup.jaccardJoinAgainst(bsh, corpus, "doc_id", "sh", 0.5)
          .select("a", "b"))
      Dedup.incrementalComponents(labels, "doc_id", newPairs)
    }
    def clusterNew(): DataFrame = {
      val bpost = postingsOf(batch.select("doc_id", "sh"))
        .repartition(col("__sh"))
        .localCheckpoint()
      val newPairs = pairCore(asProbe(bpost), bpost, 0.5, ordered = true)
        .select("a", "b")
        .unionAll(pairCore(asProbe(bpost), corpusPostings, 0.5,
          ordered = false).select("a", "b"))
      Dedup.incrementalComponents(labels, "doc_id", newPairs)
    }

    // clusterOld with the r20 LAZY batch pin (the kept change): the
    // checkpoint materializes inside the merge's micro-edge count job
    // instead of paying its own eager job per epoch
    def clusterLazy(): DataFrame = {
      val bsh = batch.select("doc_id", "sh").localCheckpoint(eager = false)
      val newPairs = Dedup.jaccardJoin(bsh, "doc_id", "sh", 0.5)
        .select("a", "b")
        .unionAll(Dedup.jaccardJoinAgainst(bsh, corpus, "doc_id", "sh", 0.5)
          .select("a", "b"))
      Dedup.incrementalComponents(labels, "doc_id", newPairs)
    }

    val mode = sys.env.getOrElse("CHAIN_MODE", "ingest")
    if (mode == "ingest") {
      // interleaved: old, new, old, new ... (first pair is warmup)
      for (r <- 1 to 4) {
        ph(s"ingest-old r$r")(ingestOld())
        ph(s"ingest-new r$r")(ingestNew())
      }
    } else if (mode == "cluster-postings") {
      labels.count()
      for (r <- 1 to 4) {
        ph(s"cluster-old r$r")(clusterOld())
        ph(s"cluster-new r$r")(clusterNew())
      }
    } else {
      labels.count()
      for (r <- 1 to 4) {
        ph(s"cluster-old r$r")(clusterOld())
        ph(s"cluster-lazy r$r")(clusterLazy())
      }
    }
    spark.stop()
  }
}
