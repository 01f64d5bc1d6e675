package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Differential-fuzzing backend: registers the testdata tables as temp views
  * (graft functions injected), runs each SQL statement from a file (one
  * single-line statement per line), writes each result to
  * outDir/q<i>.parquet. The Python driver (tools/fuzz_differential.py) runs
  * the same SQL in DuckDB and compares.
  */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sqlFile, outDir) = args
    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions = 8, tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    registerTables(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    val statements = new String(Files.readAllBytes(Paths.get(sqlFile)), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
    statements.zipWithIndex.foreach { case (sql, i) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/q$i")
      catch {
        case e: Throwable =>
          // record the failure where the comparer can see it
          Files.writeString(Paths.get(s"$outDir/q$i.error"),
            Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    spark.stop()
  }

  /** All testdata tables as temp views (events through the nanos-safe
    * reader so `ts` is a real timestamp in both engines).
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.registerAll(spark)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")) {
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    graft.SparkEntry.eventsTable(spark, sfDir).createOrReplaceTempView("events")
  }
}
