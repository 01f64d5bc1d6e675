package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: `sbt "runMain graft.tools.ExplainDump <outDir> <tag> <query> ..."`
  * (honors SPARK_GRAFT_SF_DIR; defaults to sf0.1). The query is EXECUTED
  * once through the noop sink first so AQE finalizes the plan — the dump is
  * the executed plan, not the pre-AQE initial one. Queries that build their
  * result imperatively (streaming replays, driver loops) dump the plan of
  * the frame they return; the imperative phases are documented in
  * OPTIMIZATION notes, not capturable as one plan.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <query> ...")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val tag = args(1)
    val spark = graft.GraftSession
      .builder("local[32]", 32, tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args.drop(2)) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), formatted)
      println(s"wrote ${outDir.resolve(s"${name}_$tag.txt")}")
      spark.catalog.clearCache()
      spark.conf.set(graft.plans.AnnProbeRule.ConfKey, "false")
      graft.plans.AnnCatalog.clear()
    }
    spark.stop()
  }
}
