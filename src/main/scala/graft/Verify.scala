package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names filter the dump for
    // quick local iteration; the driver always runs with exactly two args
    val sfDir = args(0); val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Leave a red `err` row in the driver's correctness record instead
        // of a silent absence (r9 shrank 104→93 entries and it read as
        // progress): blow away any partial parquet output and plant an
        // _ERROR sidecar — the driver's parquet read of this dir then
        // fails loudly, attributed to this query.
        try {
          val qd = Paths.get(s"$outDir/$name")
          if (Files.exists(qd)) {
            import scala.jdk.CollectionConverters._
            Files.walk(qd).iterator().asScala.toSeq.reverse
              .foreach(p => Files.deleteIfExists(p))
          }
          Files.createDirectories(qd)
          Files.writeString(qd.resolve("_ERROR"),
            s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}\n")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name: marker write failed: $m")
        }
      }
      // per-query persists (dedup pipelines, sketch_stats) must not
      // accumulate across the 49-query session
      spark.catalog.clearCache()
      // ann_autoprobe_topk must leave its conf + catalog entry alive until
      // its frame is WRITTEN (the rule re-fires on the write's fresh
      // QueryExecution); reset here — after the write — so no later
      // brute-force-shaped top-k silently returns approximate IVF results
      spark.conf.set(graft.plans.AnnProbeRule.ConfKey, "false")
      graft.plans.AnnCatalog.clear()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
