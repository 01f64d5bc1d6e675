package graft.tools

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch: where does bm25_topk time go at sf0.1?
  * Usage: sbt "Test/runMain graft.tools.Bm25Probe" (test scope). */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE $name%s $best%.3f s")
    }
    val par = spark.sparkContext.defaultParallelism
    def docs = spark.read.parquet(s"$dir/documents.parquet").repartition(par)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("scan_only") { noop(docs.select("doc_id")) }
    time("split_size") { noop(docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))) }
    val terms = Seq("spark", "join", "fast")
    time("tf_inline") {
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        size(F.filter(split(col("text"), " "), x => x === lit(t))).cast("long").as(s"__tf$i") }
      noop(docs.select(col("doc_id") +: tfCols: _*))
    }
    time("full_query") {
      noop(graft.SparkEntry.queries("bm25_topk")(spark, dir))
    }
    time("repartition_only") { noop(docs.select("doc_id", "text")) }
    spark.stop()
  }
}
