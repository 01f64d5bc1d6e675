package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}
/** Scratch profiler for slow bench queries — deleted after use. */
object ProfileOps {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("search_topk")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $dt%.2f s")
      if (sys.env.contains("SHOW_PLAN"))
        println(df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("HashAggregate") || l.contains("Scan")).mkString("\n"))
    }
    spark.stop()
  }
}
