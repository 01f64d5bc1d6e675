package graft

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._

import graft.ops.{IndexFiles, ProductQuantizer}
import graft.ops.ProductQuantizer.PqSpec

/** Lease-fenced maintenance under OBJECT-STORE semantics, end to end: two
  * concurrent maintenance drivers and a lease-less reader hammer ONE flat
  * PQ store on MockObjectStoreFs (rename = copy+delete, create-exclusive
  * atomic) under a seeded schedule of interleaved delete / revive-append /
  * forced-compaction epochs. Mechanically proven:
  *
  *  - single-writer serialization: contended mutations fail loudly at
  *    lease acquisition and retry; the final store is content-identical
  *    to a quiesced rebuild (an interleaved dynamic overwrite would
  *    diverge silently);
  *  - every read window resolves a COMMITTED generation: a reader never
  *    observes a duplicated id or rows outside the [all − A − B, all]
  *    envelope. A read that outlives the ONE-CYCLE snapshot retention
  *    (generation dirs and folded sidecar files are GC'd one compaction
  *    cycle after they retire) may fail with a missing-file error and
  *    must retry — the documented object-store read contract — but can
  *    never return wrong rows.
  */
class MaintenanceRaceSpec extends SparkTestBase {

  private val pqSpec = PqSpec(m = 8, dsub = 8, stride = 64)

  test("two racing maintenance drivers + concurrent reader on copy+delete-rename store: serialized writes, committed-generation reads") {
    val s = spark
    s.sparkContext.hadoopConfiguration.set("fs.graftmock.impl",
      classOf[graft.tools.MockObjectStoreFs].getName)
    val store = "graftmock:" + graft.util.TempDirs.create("graft_maint_race")

    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = emb.select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    val setA = all.filter(_ % 4 == 1) // never a codebook-entry id (%64==0)
    val setB = all.filter(_ % 4 == 3)
    def rows(ids: Set[Long]) = emb.where(col("vec_id").isin(ids.toSeq: _*))

    ProductQuantizer.materialize(emb, "vec_id", "embedding", pqSpec, store)

    val contentions = new AtomicInteger
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def withLeaseRetry(what: String)(op: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        try { op; done = true }
        catch {
          case e: IllegalStateException
              if e.getMessage.contains("writer lease") =>
            contentions.incrementAndGet()
            attempts += 1
            if (attempts > 600) {
              failures.add(s"$what: lease never freed after $attempts tries")
              done = true
            } else Thread.sleep(25)
        }
      }
    }

    // each driver cycles its OWN id range: delete -> (maybe compact) ->
    // revive-append -> (maybe compact); the rng only varies pacing and
    // which compactions fire, never legality (append only while deleted)
    def driver(name: String, ids: Set[Long], seed: Long): Thread =
      new Thread(() => {
        try {
          val rnd = new scala.util.Random(seed)
          (1 to 2).foreach { _ =>
            withLeaseRetry(s"$name-delete") {
              ProductQuantizer.deleteFromMaterialized(
                rows(ids).select("vec_id"), "vec_id", store)
            }
            if (rnd.nextBoolean()) withLeaseRetry(s"$name-compact") {
              ProductQuantizer.compactCodes(s, store, force = true)
            }
            Thread.sleep(rnd.nextInt(50).toLong)
            withLeaseRetry(s"$name-append") {
              ProductQuantizer.appendToMaterialized(
                rows(ids), "vec_id", "embedding", store)
            }
            if (rnd.nextBoolean()) withLeaseRetry(s"$name-compact2") {
              ProductQuantizer.compactCodes(s, store, force = true)
            }
            Thread.sleep(rnd.nextInt(50).toLong)
          }
        } catch {
          case e: Throwable => failures.add(s"$name died: ${e.getMessage}")
        }
      }, name)

    val stop = new AtomicBoolean(false)
    val staleRetries = new AtomicInteger
    val goodReads = new AtomicInteger
    val reader = new Thread(() => {
      val lower = all -- setA -- setB
      while (!stop.get()) {
        try {
          val (_, (_, codes)) =
            ProductQuantizer.fromMaterialized(s, store, Some(pqSpec))
          val seen = codes.select("__id").collect().map(_.getLong(0)).toSeq
          val mult = seen.groupBy(identity).map { case (id, g) => id -> g.size }
          // a half-committed APPEND is legitimate (task-level commits land
          // incrementally), so churned ids may be partial — but NO id may
          // ever exceed its m code rows (duplication = interleaved writers
          // or a failed revive purge), ids outside the churn must always
          // be complete, and nothing outside the corpus may appear
          val dup = mult.filter(_._2 > pqSpec.m)
          val tornStable = lower.filter(id => mult.getOrElse(id, 0) != pqSpec.m)
          if (dup.nonEmpty)
            failures.add(s"duplicated ids: ${dup.take(3)}")
          else if (tornStable.nonEmpty)
            failures.add(s"stable ids torn: ${tornStable.take(3)}")
          else if (!mult.keySet.subsetOf(all))
            failures.add("ids outside the corpus visible")
          else goodReads.incrementAndGet()
        } catch {
          // a reader older than one retention cycle loses its snapshot —
          // retryable by contract; anything else is a real failure
          case e: Throwable =>
            val m = String.valueOf(e.getMessage) + " " +
              String.valueOf(Option(e.getCause).map(_.getMessage).orNull)
            if (m.contains("does not exist") || m.contains("DOES_NOT_EXIST") ||
                m.contains("FileNotFound") || m.contains("PATH_NOT_FOUND") ||
                m.contains("Unable to infer schema"))
              staleRetries.incrementAndGet()
            else failures.add(s"reader died: $m")
        }
      }
    }, "race-reader")

    val a = driver("driver-a", setA, seed = 1701L)
    val b = driver("driver-b", setB, seed = 1702L)
    reader.start(); a.start(); b.start()
    a.join(600000); b.join(600000)
    stop.set(true); reader.join(600000)

    assert(failures.isEmpty, s"invariant violations: ${
      failures.toArray.mkString("; ")}")
    assert(goodReads.get > 0, "reader never completed a read")
    info(s"reads=${goodReads.get} staleRetries=${staleRetries.get} " +
      s"leaseContentions=${contentions.get}")

    // quiesced: age out retained generations/sidecars, then the store must
    // equal a from-scratch rebuild of the same corpus, probe for probe
    ProductQuantizer.compactCodes(s, store, force = true)
    ProductQuantizer.compactCodes(s, store, force = true)
    val (_, (_, codes)) = ProductQuantizer.fromMaterialized(s, store, Some(pqSpec))
    val ids = codes.select("__id").collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.sorted == all.toSeq.sorted)
    assert(ids.size == all.size * pqSpec.m)
    val qv = emb.where(col("vec_id") === 1).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val (_, pre) = ProductQuantizer.fromMaterialized(s, store, Some(pqSpec))
    val got = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding", qv,
      k = 10, pqSpec, overfetch = 100, precomputed = Some(pre))
      .collect().map(_.getLong(0)).toSeq
    val want = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding", qv,
      k = 10, pqSpec, overfetch = 100).collect().map(_.getLong(0)).toSeq
    assert(got == want,
      "post-race store probes diverge from a quiesced rebuild")
  }

  test("generation flip is fenced: a lease broken and re-acquired mid-epoch refuses the stale writer's commit") {
    // The single-writer CONTRACT makes a mid-epoch takeover an operator
    // error; the r19 fence (IndexFiles.fenceWriterLease) makes it a LOUD
    // one. Simulated cross-JVM via the jvmScopeForTest seam: writer A
    // opens a long epoch; an operator (believing A dead) breaks the lease
    // and writer B acquires; A's epoch then reaches its generation flip —
    // which must be refused, leaving the store on the committed generation.
    val s = spark
    val store = graft.util.TempDirs.create("graft_fence_race")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ProductQuantizer.materialize(emb, "vec_id", "embedding", pqSpec, store)
    val genBefore = ProductQuantizer.resolveCodesDir(s, store)
    IndexFiles.jvmScopeForTest.set("jvmA//")
    try {
      val ex = intercept[IllegalStateException] {
        IndexFiles.withWriterLease(s, store, "long-epoch") {
          // operator takeover from ANOTHER JVM mid-epoch
          IndexFiles.jvmScopeForTest.set("jvmB//")
          IndexFiles.breakWriterLease(s, store)
          IndexFiles.withWriterLease(s, store, "takeover") {
            // back on the STALE writer: its epoch tries to commit a
            // forced compaction — publishCodesGen must refuse the flip
            IndexFiles.jvmScopeForTest.set("jvmA//")
            try ProductQuantizer.compactCodes(s, store, force = true)
            finally IndexFiles.jvmScopeForTest.set("jvmB//")
          }
        }
      }
      assert(ex.getMessage.contains("broken mid-epoch"), ex.getMessage)
    } finally IndexFiles.jvmScopeForTest.set("")
    // the store still resolves the previously committed generation, and
    // reads stay row-identical to the pre-takeover corpus
    assert(ProductQuantizer.resolveCodesDir(s, store) == genBefore)
    val (_, (_, codes)) = ProductQuantizer.fromMaterialized(s, store, Some(pqSpec))
    assert(codes.count() == emb.count() * pqSpec.m) // long-form: one row per subspace
  }

  test("the fence covers SUBDIRECTORY tables of the leased root (PQ codes / graph edges shape)") {
    // r19 review finding: the fence used to look up the in-process lease
    // by the mutated table's own path, but ProductQuantizer/GraphAnn lease
    // the store ROOT and write their manifests under $root/codes /
    // $root/edges — so the final manifest write of every PQ/graph
    // append/delete/compact was silently UNfenced. The fence now walks up
    // to the nearest lease this thread holds.
    val s = spark
    val store = graft.util.TempDirs.create("graft_fence_subdir")
    // intact lease: fencing a subdirectory is a no-op (positive path)
    IndexFiles.withWriterLease(s, store, "epoch") {
      IndexFiles.fenceWriterLease(s, s"$store/codes")
    }
    // un-leased thread: no-op (initial builds run the same final writes)
    IndexFiles.fenceWriterLease(s, s"$store/codes")
    // broken + re-acquired mid-epoch: the stale writer's subdirectory
    // write must be refused
    IndexFiles.jvmScopeForTest.set("jvmA//")
    try {
      val ex = intercept[IllegalStateException] {
        IndexFiles.withWriterLease(s, store, "long-epoch") {
          IndexFiles.jvmScopeForTest.set("jvmB//")
          IndexFiles.breakWriterLease(s, store)
          IndexFiles.withWriterLease(s, store, "takeover") {
            IndexFiles.jvmScopeForTest.set("jvmA//")
            try IndexFiles.fenceWriterLease(s, s"$store/codes")
            finally IndexFiles.jvmScopeForTest.set("jvmB//")
          }
        }
      }
      assert(ex.getMessage.contains("broken mid-epoch"), ex.getMessage)
    } finally IndexFiles.jvmScopeForTest.set("")
  }
}
