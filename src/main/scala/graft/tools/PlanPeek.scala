package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/timing inspector for registered queries: best-of-3 noop-sink wall
  * clock plus the joins/exchanges/aggregates skeleton of the executed plan.
  *
  * Usage: `sbt "runMain graft.tools.PlanPeek <query> [query ...]"`
  * (honors SPARK_GRAFT_SF_DIR; defaults to sf0.1). This is the per-query
  * drill-down behind graft.Bench — run it before and after touching a
  * query's plan shape.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32, tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"== $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      // the noop writes above run their OWN QueryExecutions; execute this
      // df once so AQE finalizes ITS plan — otherwise the print below shows
      // the pre-AQE initial plan (wrong join strategies/exchange counts)
      df.collect()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("HashAggregate") || l.contains("Scan parquet") ||
          l.contains("Sort") || l.contains("Window") || l.contains("ObjectHashAggregate") ||
          l.contains("SortAggregate"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
