package graft.tools

import org.apache.spark.sql.functions._

/** Generate a synthetic sf1-equivalent fixture (10× sf0.1) under
  * `target/sfsynth1/` for a CORRECTNESS sweep one decade past the bench
  * scale — the driver ships sf{0.001,0.01,0.1} only, so this derives the
  * next rung deterministically from sf0.1 with the ScaleSmoke recipes:
  *
  *  - `documents`: 10 salted copies — each copy's vocabulary re-codes
  *    through md5 (token → salted hash token), so copies share NO shingles
  *    and duplicate density stays constant (the blow-up measures scale,
  *    not an artificial cross-copy duplicate explosion); ids shift by
  *    c·10⁶.
  *  - `embeddings`: 10 id-shifted copies (10⁶ is a multiple of every
  *    centroid stride used by the gates, so bucket COUNT grows while
  *    bucket size stays constant).
  *  - `events`: 10 user-shifted copies (per-user session structure
  *    preserved; event ids shift to stay unique).
  *  - every other table copies through verbatim.
  *
  * The output is a normal sf dir: `graft.Verify <dir> <out> <queries...>`
  * plus `tools/oracle_check.py <dir> <out> <queries...>` run the REAL
  * hash gate against DuckDB at the synthetic scale.
  *
  * Usage: sbt "Test/runMain graft.tools.SynthScale [srcDir] [outDir] [k]"
  */
object SynthScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/target/sfsynth1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the driver's sf dirs hold one parquet FILE per table (DuckDB reads
    // the literal path), so land each table as a single file: write the
    // one-part directory, then promote the part file
    def writeTable(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      import java.nio.file.{Files => JF, Paths => JP, StandardCopyOption}
      val tmp = s"$out/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      import scala.jdk.CollectionConverters._
      val part = JF.list(JP.get(tmp)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).next()
      JF.createDirectories(JP.get(out))
      JF.move(part, JP.get(out, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      JF.walk(JP.get(tmp)).iterator().asScala.toSeq.reverse
        .foreach(p => JF.deleteIfExists(p))
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    writeTable(
      (0 until k).map { c =>
        docs.select(
          (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => substring(md5(concat(t, lit(s"|$c"))), 1, 8))).as("text"),
          col("lang"), col("source"))
      }.reduce(_ unionAll _)
        .withColumn("n_chars", length(col("text"))),
      "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    writeTable(
      (0 until k).map { c =>
        emb.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionAll _),
      "embeddings")

    val ev = spark.read.parquet(s"$src/events.parquet")
    writeTable(
      (0 until k).map { c =>
        ev.select((col("event_id") + lit(c * 100000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(c * 1000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionAll _),
      "events")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem").foreach { t =>
      writeTable(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    println(s"SYNTHSCALE wrote $out at ${k}x $src")
    spark.stop()
  }
}
