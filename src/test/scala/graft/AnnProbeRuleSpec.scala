package graft

import org.apache.spark.sql.functions._

import graft.functions.array_cosine_distance
import graft.ops.AnnIndex
import graft.plans.AnnCatalog

/** Opt-in ANN plan substitution: the brute-force top-k shape over a
  * registered indexed relation must become an index probe when (and ONLY
  * when) the session opts in; non-matching shapes stay untouched.
  */
class AnnProbeRuleSpec extends SparkTestBase {

  private val ConfKey = "spark.graft.ann.autoProbe"

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def qvec: Array[Double] =
    emb.where(col("vec_id") === 1).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray

  private def bruteForceShape(k: Int = 10) =
    emb.select(col("vec_id"),
        array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("cos_dist"))
      // asc_nulls_last matches probeTopK's ordering; plain .asc (NullsFirst)
      // is deliberately NOT rewritten (see the non-matching-shapes test)
      .orderBy(col("cos_dist").asc_nulls_last, col("vec_id").asc)
      .limit(k)

  private def withProbe[A](body: => A): A = {
    AnnCatalog.clear()
    AnnCatalog.register(emb, "vec_id", "embedding",
      AnnIndex.build(emb, "vec_id", "embedding", stride = 64), nprobe = 4)
    spark.conf.set(ConfKey, "true")
    try body finally {
      spark.conf.unset(ConfKey)
      AnnCatalog.clear()
    }
  }

  test("registerProbe splices an arbitrary probe tier (generalized catalog)") {
    // the generalized entry: any (qvec, k) => (id, cos_dist) frame rides
    // the same brute-force-shape substitution as IVF. Register a probe
    // that tags its rows with a recognizable distance so the output
    // provably came from the probe, not the corpus sort.
    AnnCatalog.clear()
    AnnCatalog.registerProbe(emb, "vec_id", "embedding", (_, k) => {
      val sp = spark
      import sp.implicits._
      (0L until k.toLong).map(i => (i, 42.0 + i))
        .toDF("vec_id", "cos_dist")
    })
    spark.conf.set(ConfKey, "true")
    try {
      val got = bruteForceShape(3).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((0L, 42.0), (1L, 43.0), (2L, 44.0)), got)
    } finally {
      spark.conf.unset(ConfKey)
      AnnCatalog.clear()
    }
  }

  test("probe runs ONCE per (entry, qvec, k) across re-optimizations") {
    // the same logical query is optimized more than once per
    // materialization (plan assertion, then df.write builds a fresh
    // QueryExecution) — the entry memo must serve the second pass without
    // re-running the probe, or an expensive driver-beam probe doubles
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    AnnCatalog.clear()
    AnnCatalog.registerProbe(emb, "vec_id", "embedding", (_, k) => {
      calls.incrementAndGet()
      val sp = spark
      import sp.implicits._
      (0L until k.toLong).map(i => (i, 42.0 + i)).toDF("vec_id", "cos_dist")
    })
    spark.conf.set(ConfKey, "true")
    try {
      val df = bruteForceShape(3)
      val p1 = df.queryExecution.optimizedPlan.toString // optimization #1
      assert(calls.get == 1, s"probe calls after first optimize: ${calls.get}")
      val got = bruteForceShape(3).collect() // fresh frame: optimization #2
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(calls.get == 1,
        s"probe re-ran on re-optimization: ${calls.get} calls")
      assert(got == Seq((0L, 42.0), (1L, 43.0), (2L, 44.0)), got)
      assert(p1.nonEmpty)
      // a DIFFERENT k is a different probe answer — must miss the memo
      bruteForceShape(2).collect()
      assert(calls.get == 2, s"distinct k served from memo: ${calls.get}")
      // re-registration (new Entry) starts a fresh memo
      AnnCatalog.clear()
      AnnCatalog.registerProbe(emb, "vec_id", "embedding", (_, k) => {
        calls.incrementAndGet()
        val sp = spark
        import sp.implicits._
        (0L until k.toLong).map(i => (i, 42.0 + i)).toDF("vec_id", "cos_dist")
      })
      bruteForceShape(3).collect()
      assert(calls.get == 3, s"stale memo across re-registration: ${calls.get}")
    } finally {
      spark.conf.unset(ConfKey)
      AnnCatalog.clear()
    }
  }

  test("opt-in rewrite substitutes the probe plan (semi-join visible)") {
    withProbe {
      val df = bruteForceShape()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("LeftSemi"), plan) // the nprobe bucket semi-join
      // results come from the probe path: identical to calling it directly
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
        .probeTopK(qvec, 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want)
    }
  }

  test("rewrite preserves output attributes for downstream operators") {
    withProbe {
      // filtering on the projected columns after the limit must still resolve
      val out = bruteForceShape().where(col("cos_dist") >= 0.0)
        .select(col("vec_id"))
      assert(out.count() == 10)
    }
  }

  test("no opt-in, no rewrite — and unregistered relations stay brute force") {
    AnnCatalog.clear()
    spark.conf.unset(ConfKey)
    val plan = bruteForceShape().queryExecution.optimizedPlan.toString
    assert(!plan.contains("LeftSemi"), plan)
    // opt-in alone (no registered index) also leaves the plan alone
    spark.conf.set(ConfKey, "true")
    try {
      val p2 = bruteForceShape().queryExecution.optimizedPlan.toString
      assert(!p2.contains("LeftSemi"), p2)
    } finally spark.conf.unset(ConfKey)
  }

  test("non-matching shapes are untouched even when opted in") {
    withProbe {
      // descending sort: not a nearest-neighbor query
      val desc = emb.select(col("vec_id"),
          array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("d"))
        .orderBy(col("d").desc).limit(5)
      assert(!desc.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      // extra projected column: output schema wider than (id, dist)
      val wide = emb.select(col("vec_id"), col("embedding"),
          array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("d"))
        .orderBy(col("d").asc).limit(5)
      assert(!wide.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      // distance to a non-literal (column) vector
      val nonLit = emb.as("a").crossJoin(emb.limit(1).as("b"))
        .select(col("a.vec_id"),
          array_cosine_distance(col("a.embedding"), col("b.embedding")).as("d"))
        .orderBy(col("d").asc).limit(5)
      assert(!nonLit.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      // NullsFirst sort (plain .asc): probeTopK orders asc_nulls_last, so
      // rewriting would move null-distance rows out of the head of the top-k
      val nullsFirst = emb.select(col("vec_id"),
          array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("cos_dist"))
        .orderBy(col("cos_dist").asc, col("vec_id").asc).limit(5)
      assert(!nullsFirst.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    }
  }

  test("top-k over a DIFFERENT vector column of the indexed relation is untouched") {
    // a relation with TWO array columns: the index is built over `embedding`,
    // so a distance over the other column (`emb2`, a real AttributeReference
    // of the scan) must stay brute force — probing would answer a different
    // query over the wrong vectors
    val dir = java.nio.file.Files.createTempDirectory("graft_two_vec").toString
    emb.select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x => -x).as("emb2"))
      .write.mode("overwrite").parquet(dir)
    val two = spark.read.parquet(dir)
    AnnCatalog.clear()
    AnnCatalog.register(two, "vec_id", "embedding",
      AnnIndex.build(two, "vec_id", "embedding", stride = 64), nprobe = 4)
    spark.conf.set(ConfKey, "true")
    try {
      val overOther = two.select(col("vec_id"),
          array_cosine_distance(col("emb2"), typedLit(qvec.toSeq)).as("cos_dist"))
        .orderBy(col("cos_dist").asc_nulls_last, col("vec_id").asc).limit(5)
      assert(!overOther.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        overOther.queryExecution.optimizedPlan.toString)
      // sanity: the registered column over the same relation DOES match
      val overVec = two.select(col("vec_id"),
          array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("cos_dist"))
        .orderBy(col("cos_dist").asc_nulls_last, col("vec_id").asc).limit(5)
      assert(overVec.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        overVec.queryExecution.optimizedPlan.toString)
    } finally {
      spark.conf.unset(ConfKey)
      AnnCatalog.clear()
    }
  }

  test("probe results track the index's recall contract vs exact") {
    withProbe {
      val probed = bruteForceShape(5).collect().map(_.getLong(0)).toSet
      spark.conf.unset(ConfKey)
      val exact = bruteForceShape(5).collect().map(_.getLong(0)).toSet
      // nprobe=4 of ~8 buckets: most of the true top-5 should survive
      assert((probed & exact).size >= 3, s"probed=$probed exact=$exact")
    }
  }
}
