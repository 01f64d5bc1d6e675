package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object EmbedProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    def timeIt(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
      }
      println(f"PROF $name%s $best%.3f s")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).size
    // warmup
    graft.SparkEntry.queries("search_topk")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    timeIt("raw_pairs_only") {
      graft.ops.SimilarityJoin.cosineJoinLsh(emb, "vec_id", "embedding", 0.55, dim)
        .select("a", "b").write.format("noop").mode("overwrite").save()
    }
    timeIt("old_pipeline") {
      val pairs = graft.ops.SimilarityJoin.cosineJoinLsh(emb, "vec_id", "embedding", 0.55, dim).select("a", "b")
      graft.ops.Dedup.componentsStar(pairs, "vec_id")
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("new_pipeline") {
      graft.ops.Dedup.embedComponents(emb, "vec_id", "embedding", 0.55, dim)
        .write.format("noop").mode("overwrite").save()
    }
    timeIt("contraction_only") {
      val keyed = emb.select(col("vec_id").as("__id"), col("embedding").as("__v"))
        .withColumn("__selfdup",
          graft.functions.array_cosine_distance(col("__v"), col("__v")) <= lit(0.55))
      val groups = keyed.where(col("__selfdup"))
        .groupBy("__v").agg(min(col("__id")).as("__rep"), count(lit(1)).as("__m"))
      groups.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
