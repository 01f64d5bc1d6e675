package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.ops.ProductQuantizer
import graft.ops.ProductQuantizer.PqSpec

/** The r17 stretch composition: the autoprobe plan substitution
  * (plans/AnnProbe) answering brute-force-shaped top-k queries from a
  * flat PQ store WHILE a maintenance driver generation-flips that store
  * with forced compactions, on MockObjectStoreFs (rename = copy+delete,
  * create-exclusive atomic). Compactions never change the content, so
  * every COMMITTED generation answers identically — which makes the
  * invariant sharp:
  *
  *  - a query must return exactly the quiesced answer (it resolved a
  *    committed generation), or
  *  - fail with a retryable missing-file error (its resolved generation
  *    outlived the one-cycle snapshot retention — the documented
  *    object-store read contract), and NEVER a torn answer (rows from a
  *    half-written generation would change the top-k).
  *
  * Each query uses a FRESH query vector so the probe-plan memo cannot
  * mask generation resolution: every read re-opens the store
  * (fromMaterialized inside the registered probe) against whatever
  * generation pointer is current.
  */
class AutoprobeCompactionRaceSpec extends SparkTestBase {

  private val pqSpec = PqSpec(m = 8, dsub = 8, stride = 64)

  test("autoprobe racing forced compactions: committed answers or retryable misses, never torn") {
    val s = spark
    s.sparkContext.hadoopConfiguration.set("fs.graftmock.impl",
      classOf[graft.tools.MockObjectStoreFs].getName)
    val store = "graftmock:" + graft.util.TempDirs.create("graft_autoprobe_race")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ProductQuantizer.materialize(emb, "vec_id", "embedding", pqSpec, store)

    graft.GraftSession.attachAnnProbeRule(s)
    graft.plans.AnnCatalog.clear()
    graft.plans.AnnCatalog.registerProbe(emb, "vec_id", "embedding",
      (q, k) => {
        // open PER PROBE: generation resolution happens on every query,
        // which is exactly the surface racing the compaction epochs
        val (_, pre) = ProductQuantizer.fromMaterialized(s, store, Some(pqSpec))
        ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding", q, k,
          pqSpec, overfetch = 100, precomputed = Some(pre))
      })
    s.conf.set("spark.graft.ann.autoProbe", "true")
    try {
      val qvecs: Seq[Array[Double]] = emb.orderBy("vec_id").limit(40)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
      // quiesced expectations via the probe directly (no catalog memo
      // consumed): the autoprobe splice executes this same plan, so on a
      // committed generation the answers are bit-identical
      val expected: Seq[Seq[(Long, Double)]] = qvecs.map { q =>
        ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding", q, 10,
            pqSpec, overfetch = 100)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }

      def ask(q: Array[Double]): Seq[(Long, Double)] = {
        val df = emb.select(col("vec_id"),
            graft.functions.array_cosine_distance(
              col("embedding"), typedLit(q.toSeq)).as("cos_dist"))
          .orderBy(col("cos_dist").asc_nulls_last, col("vec_id").asc)
          .limit(10)
        require(df.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
          "autoprobe did not splice — the race is not exercising the probe")
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }

      val stop = new AtomicBoolean(false)
      val compactions = new AtomicInteger
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val maintainer = new Thread(() => {
        val rnd = new scala.util.Random(1804L)
        try {
          while (!stop.get()) {
            ProductQuantizer.compactCodes(s, store, force = true)
            compactions.incrementAndGet()
            Thread.sleep(rnd.nextInt(30).toLong)
          }
        } catch {
          case e: Throwable => failures.add(s"maintainer died: ${e.getMessage}")
        }
      }, "autoprobe-race-maintainer")

      val goodReads = new AtomicInteger
      val staleRetries = new AtomicInteger
      maintainer.start()
      try {
        qvecs.lazyZip(expected).foreach { (q, want) =>
          try {
            val got = ask(q)
            if (got == want) goodReads.incrementAndGet()
            else failures.add(s"torn answer: got ${got.take(3)}... want ${want.take(3)}...")
          } catch {
            case e: Throwable =>
              // Classify over the WHOLE cause chain, by type as well as by
              // message: Spark wraps the mid-compaction file deletion as
              // FAILED_READ_FILE.FILE_NOT_EXIST ("... does not exist") in
              // some read paths but FAILED_READ_FILE.NO_HINT in others
              // (e.g. the footer read), where the FileNotFoundException
              // cause carries only the path as its message — both are the
              // same documented retryable missing-file class.
              val chain = Iterator.iterate(e)(_.getCause)
                .takeWhile(_ != null).take(10).toList
              val m = chain.map(t =>
                s"${t.getClass.getSimpleName}: ${t.getMessage}").mkString(" <- ")
              if (chain.exists(t => t.isInstanceOf[java.io.FileNotFoundException] ||
                    t.isInstanceOf[java.nio.file.NoSuchFileException]) ||
                  m.contains("does not exist") || m.contains("DOES_NOT_EXIST") ||
                  m.contains("FILE_NOT_EXIST") || m.contains("FileNotFound") ||
                  m.contains("PATH_NOT_FOUND") ||
                  m.contains("Unable to infer schema"))
                staleRetries.incrementAndGet()
              else failures.add(s"reader died: $m")
          }
        }
      } finally {
        stop.set(true)
        maintainer.join(600000)
      }

      assert(failures.isEmpty,
        s"invariant violations: ${failures.toArray.mkString("; ")}")
      assert(goodReads.get > 0, "no query ever completed against a committed generation")
      assert(compactions.get > 0, "the maintainer never compacted — no race happened")
      info(s"reads=${goodReads.get} staleRetries=${staleRetries.get} " +
        s"compactions=${compactions.get}")
    } finally {
      s.conf.set("spark.graft.ann.autoProbe", "false")
      graft.plans.AnnCatalog.clear()
    }
  }
}
