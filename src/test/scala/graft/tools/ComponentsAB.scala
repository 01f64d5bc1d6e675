package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: min-label propagation vs large/small-star contraction on
  * the real near-dup pair graph at a given SF.
  * Usage: sbt "Test/runMain graft.tools.ComponentsAB <sfdir>"
  */
object ComponentsAB {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), graft.ops.TextOps.wordNGrams(col("text"), 3).as("sh"))
    val pairs = graft.ops.Dedup.jaccardJoin(docs, "doc_id", "sh", 0.5)
      .select("a", "b").persist()
    println(s"pairs: ${pairs.count()}")
    def time(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"TIMING $name%s $best%.3f s")
    }
    time("components") {
      graft.ops.Dedup.components(pairs, "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("componentsStar") {
      graft.ops.Dedup.componentsStar(pairs, "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
