package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic rung for the NEAR-duplicate band-bucket blowup (the r18
  * verdict's top next-round item): ONE cluster of m DISTINCT vectors all
  * within tau of each other — tiny per-coordinate jitter, the
  * templated-page shape — planted on top of the sf0.1 embeddings
  * background. Exact-dup contraction does NOT fire (every vector is
  * bit-distinct), so before r19 the banded LSH emitted m(m-1)/2 verified
  * pairs into the components fixpoint; the spanning tier
  * ([[graft.ops.SimilarityJoin.cosineLshComponentEdges]]) must hold the
  * full `embedComponents` wall ~linear in m.
  *
  * Measures, per m:
  *  - `spanning_edges` / `spanning_wall`: edge count + wall of the r19
  *    spanning tier;
  *  - `embed_wall`: full Dedup.embedComponents (spanning-routed) wall;
  *  - `allpairs_pairs` / `allpairs_wall`: the pre-r19 pair tier
  *    (cosineJoinLsh count — the quadratic being replaced), only up to
  *    `maxAllPairsM` (the count alone is 5·10⁷ rows at m=10⁴);
  *  - `oldpath_wall`: the full pre-r19 pipeline (all-pairs →
  *    componentsStar), only up to `maxOldPathM`;
  *  - labeling equality spanning-vs-all-pairs up to `maxOldPathM`.
  *
  * Usage: sbt "Test/runMain graft.tools.NearDupRung [m1,m2,...] [maxAllPairsM] [maxOldPathM] [maxEmbedM]"
  */
object NearDupRung {
  def main(args: Array[String]): Unit = {
    val ms = args.headOption.getOrElse("1000,3000,10000,30000")
      .split(",").map(_.trim.toInt).toSeq
    val maxAllPairsM = args.lift(1).map(_.toInt).getOrElse(10000)
    val maxOldPathM = args.lift(2).map(_.toInt).getOrElse(3000)
    // above maxEmbedM only the spanning tier is timed: the full
    // embedComponents fixpoint on a 10^6-member clique's edge set is its
    // own (componentsStar) measurement, not the tier's
    val maxEmbedM = args.lift(3).map(_.toInt).getOrElse(Int.MaxValue)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // heap must come from the LAUNCHER (tools/rung_sweep.sh -Xmx, or sbt
      // javaOptions): spark.driver.memory set in-process is silently
      // ignored in local mode — the JVM heap is fixed at launch
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    import spark.implicits._

    val dim = 64
    val tau = 0.55
    val bg = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    ms.foreach { m =>
      // deterministic base + per-row jitter of ~1e-5 relative on one
      // coordinate: every vector bit-distinct, every pair's cosine
      // distance ~1e-9 << tau, signatures identical => one hot bucket
      val rnd = new scala.util.Random(4242L)
      val base = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val cluster = (0 until m).map { i =>
        val v = base.clone()
        v(i % dim) = v(i % dim) + (i / dim + 1) * 1e-5f
        (1000000L + i, v)
      }
      val df = cluster.toDF("vec_id", "embedding").unionAll(bg)
        .repartition(32).localCheckpoint()

      val (nSpan, tSpan) = time {
        graft.ops.SimilarityJoin
          .cosineLshComponentEdges(df, "vec_id", "embedding", tau, dim).count()
      }
      if (m <= maxEmbedM) {
        val (_, tEmbed) = time {
          graft.ops.Dedup.embedComponents(df, "vec_id", "embedding", tau, dim)
            .write.format("noop").mode("overwrite").save()
        }
        println(f"RUNG m=$m%d spanning_edges=$nSpan%d spanning_wall=$tSpan%.2fs embed_wall=$tEmbed%.2fs")
      } else
        println(f"RUNG m=$m%d spanning_edges=$nSpan%d spanning_wall=$tSpan%.2fs")

      if (m <= maxAllPairsM) {
        val (nAll, tAll) = time {
          graft.ops.SimilarityJoin
            .cosineJoinLsh(df, "vec_id", "embedding", tau, dim).count()
        }
        println(f"RUNG m=$m%d allpairs_pairs=$nAll%d allpairs_wall=$tAll%.2fs")
      }
      if (m <= maxOldPathM) {
        val (oldLabels, tOld) = time {
          val pairs = graft.ops.SimilarityJoin
            .cosineJoinLsh(df, "vec_id", "embedding", tau, dim)
            .select(col("a"), col("b"))
          graft.ops.Dedup.componentsStar(pairs, "vec_id")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        }
        val newLabels = graft.ops.Dedup
          .embedComponents(df, "vec_id", "embedding", tau, dim)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        println(f"RUNG m=$m%d oldpath_wall=$tOld%.2fs labels_equal=${oldLabels == newLabels}%b")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
