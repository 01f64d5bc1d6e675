package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    def time(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE $name%s $best%.3f s")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    time("head_qvec") {
      emb.where(col("vec_id") === 0).select(col("e")).head()
    }
    val qv = emb.where(col("vec_id") === 0).select(col("e")).head().getSeq[Double](0).toArray
    val qcode = graft.ops.Quantize.codesLocal(qv)
    time("codes_only") {
      emb.select(col("vec_id"), graft.ops.Quantize.codes(col("e")).as("q"))
        .write.format("noop").mode("overwrite").save()
    }
    time("main_scan") {
      emb.select(col("vec_id"),
          graft.ops.Quantize.cosineDistance(
            graft.ops.Quantize.codes(col("e")), typedLit(qcode)).as("q_dist"))
        .orderBy(col("q_dist").asc_nulls_last, col("vec_id").asc)
        .limit(10)
        .write.format("noop").mode("overwrite").save()
    }
    time("full_query") {
      graft.SparkEntry.queries("quantized_topk")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
