package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch measurement: per-epoch cost of jaccardJoinAgainst with the
  * corpus side (a) re-exploded+re-shuffled per call vs (b) pre-exploded,
  * pre-partitioned on the join key and cached — the in-memory flavor of
  * the materializePostings at-rest posture.
  */
object AgainstProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32,
      tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def ph[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$name] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def shingle(f: DataFrame): DataFrame =
      f.select(col("doc_id"), graft.ops.TextOps.wordNGrams(col("text"), 3).as("sh"))
    val corpus = shingle(d.where(pmod(col("doc_id"), lit(2)) === 0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val batch = shingle(d.where(pmod(col("doc_id"), lit(4)) === 1)).localCheckpoint()

    for (round <- 1 to 3) {
      ph(s"against-shingles r$round") {
        graft.ops.Dedup.jaccardJoinAgainst(batch, corpus, "doc_id", "sh", 0.5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    val postings = corpus
      .select(col("doc_id").as("__id"), array_distinct(col("sh")).as("__arr"))
      .withColumn("__sz", size(col("__arr")).cast("long"))
      .where(col("__sz") > 0)
      .select(col("__id").as("b"), col("__sz").as("size_b"),
        explode(col("__arr")).as("__sh"))
      .repartition(col("__sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ph("postings build+pin") { postings.count() }
    for (round <- 1 to 3) {
      ph(s"against-postings r$round") {
        graft.ops.Dedup.jaccardJoinAgainstPostings(batch, postings,
            "doc_id", "sh", 0.5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
