package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.GraftSession
import graft.ops.{Dedup, TextOps}
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32, tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(32)
    val sh = docs.select(col("doc_id"), TextOps.wordNGrams(col("text"), 3).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("sh materialize") { println("  " + sh.count()) }
    val sigs = Dedup.minhashSignatures(sh, "doc_id", "sh", 16).persist(StorageLevel.MEMORY_AND_DISK)
    time("sigs materialize") { println("  " + sigs.count()) }
    val bands = Dedup.lshBands(sigs, "doc_id", 16, 4)
    val cands = Dedup.lshCandidatePairs(bands, "doc_id")
    time("cands") { println("  " + cands.count()) }
    time("verify") { println("  " + Dedup.verifyJaccard(cands, sh, "doc_id", "sh", 0.5).count()) }
    spark.stop()
  }
}
