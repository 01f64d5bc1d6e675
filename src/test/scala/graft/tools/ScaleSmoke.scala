package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior smoke: run the near-dup pipeline on 1x/2x/4x copies of
  * the sf0.1 documents table and print wall times. Each copy's vocabulary
  * is re-coded through md5 (token -> salted hash token), so copies share
  * NO shingles: duplicate density stays constant as the corpus grows —
  * measuring the pipeline's scaling, not an artificial cross-copy
  * duplicate explosion. Usage: sbt "Test/runMain graft.tools.ScaleSmoke".
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    def corpusTimes(k: Int): (Double, Double, Long, Long) = {
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val copies = (0 until k).map { c =>
        base.select(
          (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => substring(md5(concat(t, lit(s"|$c"))), 1, 8))).as("text"))
      }
      val docs = copies.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val sh = docs.select(col("doc_id"),
        graft.ops.TextOps.wordNGrams(col("text"), 3).as("sh"))

      // exact inverted-index jaccard join
      var t0 = System.nanoTime()
      val nPairs = graft.ops.Dedup.jaccardJoin(sh, "doc_id", "sh", 0.5).count()
      val tJaccard = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()

      // minhash + banded LSH + verification
      val sh2 = docs.select(col("doc_id"),
        graft.ops.TextOps.wordNGrams(col("text"), 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t0 = System.nanoTime()
      val sigs = graft.ops.Dedup.minhashSignatures(sh2, "doc_id", "sh", 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cands = graft.ops.Dedup.lshCandidatePairs(
        graft.ops.Dedup.lshBands(sigs, "doc_id", 16, 4), "doc_id")
      val nLsh = graft.ops.Dedup.verifyJaccard(cands, sh2, "doc_id", "sh", 0.5).count()
      val tLsh = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      docs.unpersist()
      (tJaccard, tLsh, nPairs, nLsh)
    }

    // warmup pass initializes codegen/shuffle machinery
    corpusTimes(1)
    Seq(1, 2, 4).foreach { k =>
      val (tj, tl, nj, nl) = corpusTimes(k)
      println(f"SCALE k=$k%d jaccard=$tj%.2f s ($nj%d pairs) minhash_lsh=$tl%.2f s ($nl%d pairs)")
    }
    spark.stop()
  }
}
