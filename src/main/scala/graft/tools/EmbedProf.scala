package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, SimilarityJoin}

/** Scratch INTRA-JVM A/B for the r20 embed-dedup gate-scale residual
  * (VERDICT r19 #3): the spanning-edge tier (cosineLshComponentEdges,
  * typed per-bucket union-find + small-input probe) vs the all-pairs tier
  * (cosineJoinLsh, pure codegen SQL) on the SAME gate-scale rep table,
  * plus the full embedComponents / semanticDedup composites.
  */
object EmbedProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32,
      tuneSmallFileScans = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def ph(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"  [$name] ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).size
    val tau = 0.2

    val mode = sys.env.getOrElse("EMBED_MODE", "tier")
    if (mode == "plans") {
      // the tier swap is invisible in embedComponents' RETURNED plan (the
      // micro labeling enters as a LocalRelation on the driver route), so
      // dump the PAIRS intermediate both tiers produce — the plans the r20
      // size route picks between
      val outDir = java.nio.file.Paths.get("plans/r20")
      java.nio.file.Files.createDirectories(outDir)
      def dump(name: String, df: DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        java.nio.file.Files.writeString(outDir.resolve(name),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"wrote plans/r20/$name")
      }
      dump("embed_pairs_spanning_tier.txt", SimilarityJoin
        .cosineLshComponentEdges(emb, "vec_id", "embedding", tau, dim))
      spark.catalog.clearCache()
      dump("embed_pairs_allpairs_tier.txt", SimilarityJoin
        .cosineJoinLsh(emb, "vec_id", "embedding", tau, dim)
        .select(col("a"), col("b")))
      spark.stop(); return
    }
    if (mode == "tier") {
      for (r <- 1 to 4) {
        ph(s"spanning r$r")(SimilarityJoin.cosineLshComponentEdges(
          emb, "vec_id", "embedding", tau, dim))
        ph(s"allpairs r$r")(SimilarityJoin.cosineJoinLsh(
          emb, "vec_id", "embedding", tau, dim).select(col("a"), col("b")))
      }
    } else {
      for (r <- 1 to 4) {
        ph(s"embedComponents r$r")(Dedup.embedComponents(
          emb, "vec_id", "embedding", tau, dim))
        ph(s"semanticDedup r$r")(Dedup.semanticDedup(
          emb, "vec_id", "embedding", stride = 64, iters = 2, eps = tau))
      }
    }
    spark.stop()
  }
}
