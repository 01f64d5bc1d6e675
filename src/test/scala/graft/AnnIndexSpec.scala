package graft

import org.apache.spark.sql.functions._

import graft.ops.AnnIndex

/** IVF coarse quantizer: brute force is exact; probing more buckets
  * converges to brute force (recall is monotone in nprobe).
  */
class AnnIndexSpec extends SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def qvec(id: Long): Array[Double] =
    emb.where(col("vec_id") === id).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

  test("bruteForceTopK matches a full sort exactly") {
    val idx = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    val brute = idx.bruteForceTopK(qvec(5), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = emb.select(col("vec_id"),
        graft.functions.array_cosine_distance(col("embedding"),
          typedLit(qvec(5).toSeq)).as("cos_dist"))
      .orderBy(col("cos_dist").asc_nulls_last, col("vec_id").asc)
      .limit(10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(brute == full)
  }

  test("probing all buckets equals brute force; fewer buckets is a subset-ranked approximation") {
    val idx = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    val nCentroids = 500 / 64 + 1 // vec_ids divisible by 64 in [0, 500)
    val brute = idx.bruteForceTopK(qvec(3), 10)
      .collect().map(_.getLong(0)).toSet
    val allProbe = idx.probeTopK(qvec(3), 10, nprobe = nCentroids)
      .collect().map(_.getLong(0)).toSet
    assert(allProbe == brute)
    val recalls = Seq(1, 2, 4, nCentroids).map { np =>
      idx.probeTopK(qvec(3), 10, nprobe = np)
        .collect().map(_.getLong(0)).toSet.intersect(brute).size
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    // the query's own bucket is always probed first -> self-match present
    assert(idx.probeTopK(qvec(3), 1, nprobe = 1)
      .head().getLong(0) == 3L)
  }

  test("materialized index probes equal the plan-built index and prune partitions") {
    val path = java.nio.file.Files.createTempDirectory("ann_mat_test").toString
    AnnIndex.materialize(emb, "vec_id", "embedding", 64, path)
    val mat = AnnIndex.fromMaterialized(emb, "vec_id", "embedding", 64, path)
    val plan = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    val got = mat.probeTopK(qvec(3), 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = plan.probeTopK(qvec(3), 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
    // the probe must not scan every bucket: the partitioned scan carries a
    // runtime partition filter on __centroid (dynamic partition pruning)
    val df = mat.probeTopK(qvec(3), 10, nprobe = 2)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("dynamicpruning") ||
      executed.contains("PartitionFilters: [isnotnull(__centroid"),
      s"no partition pruning on the materialized probe:\n$executed")
  }

  test("appendToMaterialized: incremental growth equals a full materialize") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val path = java.nio.file.Files.createTempDirectory("ann_inc_test").toString
    val even = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val odd = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    AnnIndex.materialize(even, "vec_id", "embedding", 64, path)
    AnnIndex.appendToMaterialized(odd, emb, "vec_id", "embedding", 64, path)
    val inc = AnnIndex.fromMaterialized(emb, "vec_id", "embedding", 64, path)
    val full = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    for (nprobe <- Seq(2, 8)) {
      val got = inc.probeTopK(qvec(5), 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = full.probeTopK(qvec(5), 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"nprobe=$nprobe")
    }
    // a stride mismatch on append is rejected like on open
    intercept[IllegalArgumentException] {
      AnnIndex.appendToMaterialized(odd, emb, "vec_id", "embedding", 32, path)
    }
  }

  test("deleteFromMaterialized: delete equals a reduced-corpus materialize") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val path = java.nio.file.Files.createTempDirectory("ann_del_test").toString
    AnnIndex.materialize(emb, "vec_id", "embedding", 64, path)
    AnnIndex.deleteFromMaterialized(emb.where(pmod(col("vec_id"), lit(4)) === 3),
      emb, "vec_id", "embedding", 64, path)
    val reduced = emb.where(pmod(col("vec_id"), lit(4)) =!= 3)
    // the stored artifact is row-identical to a reduced-corpus build:
    // same (id, bucket) set, no deleted id survives
    val stored = spark.read.parquet(path)
      .select(col("vec_id"), col("__centroid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val redPath = java.nio.file.Files.createTempDirectory("ann_red_test").toString
    AnnIndex.materialize(reduced, "vec_id", "embedding", 64, redPath)
    val want = spark.read.parquet(redPath)
      .select(col("vec_id"), col("__centroid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == want)
    // and probes over the deleted artifact match the reduced build
    val del = AnnIndex.fromMaterialized(reduced, "vec_id", "embedding", 64, path)
    val full = AnnIndex.fromMaterialized(reduced, "vec_id", "embedding", 64, redPath)
    for (nprobe <- Seq(2, 8)) {
      val got = del.probeTopK(qvec(5), 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want2 = full.probeTopK(qvec(5), 10, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want2, s"nprobe=$nprobe")
    }
    // deleting a centroid-level id is refused (geometry frozen)
    intercept[IllegalArgumentException] {
      AnnIndex.deleteFromMaterialized(emb.where(col("vec_id") === 128),
        emb, "vec_id", "embedding", 64, path)
    }
    // the IVF store's bucket manifest tracks the directory truth through
    // materialize + delete (IndexManifests, shared with the graph tier)
    val manifest = java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_graft_buckets"))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.toLong).toSeq
    val dirs = new java.io.File(path).listFiles().toSeq
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("__centroid="))
      .map(_.substring("__centroid=".length).toLong).sorted
    assert(manifest == dirs)
  }

  test("kmeans refinement keeps centroid count, lowers inertia, preserves exactness") {
    val init = graft.ops.AnnIndex.kmeansCentroids(emb, "vec_id", "embedding",
      stride = 64, iters = 0)
    val refined = graft.ops.AnnIndex.kmeansCentroids(emb, "vec_id", "embedding",
      stride = 64, iters = 2)
    assert(init.count() == refined.count(), "iteration must not drop clusters")

    def inertia(cents: org.apache.spark.sql.DataFrame): Double =
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"),
          graft.functions.array_cosine_distance(col("__v"), col("__cvec")).as("d"))
        .groupBy("vec_id").agg(min("d").as("d"))
        .agg(sum("d")).head().getDouble(0)
    val (i0, i2) = (inertia(init), inertia(refined))
    assert(i2 <= i0 + 1e-6, s"inertia rose: $i0 -> $i2")

    // probing every kmeans bucket still equals brute force
    val idx = graft.ops.AnnIndex.buildKMeans(emb, "vec_id", "embedding", 64, 2)
    val all = idx.probeTopK(qvec(3), 10, nprobe = 1000)
      .collect().map(_.getLong(0)).toSeq
    val brute = idx.bruteForceTopK(qvec(3), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(all == brute)
  }

  test("materialize fails fast on an empty centroid set; stride mismatch is rejected") {
    val path = java.nio.file.Files.createTempDirectory("ann_guard_test").toString
    assertThrows[IllegalArgumentException] {
      // ids 1..499 with a stride beyond the range (0 itself excluded —
      // it divides everything) -> no centroids
      AnnIndex.materialize(emb.where(col("vec_id") > 0),
        "vec_id", "embedding", 1 << 20, path)
    }
    AnnIndex.materialize(emb, "vec_id", "embedding", 64, path)
    assertThrows[IllegalArgumentException] {
      AnnIndex.fromMaterialized(emb, "vec_id", "embedding", 32, path)
    }
  }

  test("probeTopKBatch equals per-query probeTopK for every query in the batch") {
    val idx = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    val qids = Seq(1L, 5L, 9L)
    val queries = emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = idx.probeTopKBatch(queries, "qid", "qvec", 10, nprobe = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for (qid <- qids) {
      val single = idx.probeTopK(qvec(qid), 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(got == single, s"qid $qid: batch != single-query probe")
      // ranks are 1-based and dense
      assert(batch(qid).map(_._2).sorted.toSeq == (1L to single.length))
    }
  }
}

/** PQ-ADC tier (ops/ProductQuantizer): code validity, recall vs brute
  * force, exactness when rerank covers the corpus, and the IVF-PQ
  * composition through AnnIndex.probedRows.
  */
class ProductQuantizerSpec extends SparkTestBase {
  import graft.ops.{AnnIndex, ProductQuantizer}
  import ProductQuantizer.PqSpec

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  // stride 16 -> 32 codebook entries per subspace: synthetic uniform
  // vectors carry no cluster structure for PQ to exploit, so recall needs
  // codebook granularity that real (clustered) embeddings get for free
  private val spec = PqSpec(m = 8, dsub = 8, stride = 16)

  private def qvec(id: Long): Array[Double] =
    emb.where(col("vec_id") === id).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

  private def bruteIds(q: Array[Double], k: Int): Seq[Long] =
    emb.select(col("vec_id"),
        graft.functions.array_cosine_distance(col("embedding"),
          typedLit(q.toSeq)).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id").asc)
      .limit(k).collect().map(_.getLong(0)).toSeq

  test("PQ codes: one code per (vector, subspace), all within the codebook") {
    val cb = ProductQuantizer.codebooks(emb, "vec_id", "embedding", spec)
    val ksub = cb.select("__j").distinct().count()
    assert(ksub == (500 + 15) / 16, s"unexpected codebook size $ksub")
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", cb, spec)
    assert(codes.count() == 500L * spec.m)
    assert(codes.groupBy("__id", "__m").count().where(col("count") =!= 1).count() == 0)
    assert(codes.where(col("__code") < 0 || col("__code") >= ksub).count() == 0)
  }

  test("PQ ADC rerank: recall@10 >= 8/10 vs brute force on each probe") {
    // uniform random vectors concentrate pairwise distances (no cluster
    // margin for ADC to separate), the worst case for PQ — overfetch is
    // the standard recall knob and stays a constant per query at scale
    for (id <- Seq(1L, 7L, 42L)) {
      val brute = bruteIds(qvec(id), 10).toSet
      val pq = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
          qvec(id), k = 10, spec, overfetch = 150)
        .collect().map(_.getLong(0)).toSet
      val recall = pq.intersect(brute).size
      assert(recall >= 8, s"query $id: recall@10 = $recall")
    }
  }

  test("PQ with corpus-wide overfetch equals brute force exactly") {
    val got = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(3), k = 10, spec, overfetch = 500)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteIds(qvec(3), 10))
  }

  test("materialized PQ index reloads and probes identically; geometry guarded") {
    val path = java.nio.file.Files.createTempDirectory("pq_mat_test").toString
    ProductQuantizer.materialize(emb, "vec_id", "embedding", spec, path)
    val (loaded, pre) = ProductQuantizer.fromMaterialized(spark, path)
    assert(loaded == spec)
    val viaDisk = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(7), k = 10, loaded, overfetch = 100, precomputed = Some(pre))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(7), k = 10, spec, overfetch = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaDisk == inline)
    // wrong expected geometry is rejected at open
    intercept[IllegalArgumentException] {
      ProductQuantizer.fromMaterialized(spark, path,
        expect = Some(ProductQuantizer.PqSpec(4, 16, 16)))
    }
  }

  test("PQ incremental append: half materialize + half append == full materialize") {
    val full = java.nio.file.Files.createTempDirectory("pq_full").toString
    val half = java.nio.file.Files.createTempDirectory("pq_half").toString
    ProductQuantizer.materialize(emb, "vec_id", "embedding", spec, full)
    // codebook ids all live in the even half (stride 16 keeps even ids),
    // so the half-build derives the SAME codebooks the full build did
    ProductQuantizer.materialize(
      emb.where(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "embedding",
      spec, half)
    ProductQuantizer.appendToMaterialized(
      emb.where(pmod(col("vec_id"), lit(2)) === 1), "vec_id", "embedding", half)
    def codesOf(p: String): Set[(Long, Int, Long)] =
      spark.read.parquet(s"$p/codes").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(codesOf(half) == codesOf(full))
    // probes through the appended index match the full one
    val (sp2, pre) = ProductQuantizer.fromMaterialized(spark, half)
    val viaHalf = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(3), k = 10, sp2, overfetch = 100, precomputed = Some(pre))
      .collect().map(_.getLong(0)).toSeq
    val (_, preF) = ProductQuantizer.fromMaterialized(spark, full)
    val viaFull = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(3), k = 10, spec, overfetch = 100, precomputed = Some(preF))
      .collect().map(_.getLong(0)).toSeq
    assert(viaHalf == viaFull)
  }

  test("PQ delete equals a reduced-corpus materialize (both layouts)") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // resolve the LIVE code dir (it moves across generations after a
    // compaction's atomic pointer flip)
    def codesOf(p: String): Set[(Long, Int, Long)] =
      spark.read.parquet(ProductQuantizer.resolveCodesDir(spark, p))
        .select(col("__id"), col("__m"), col("__code"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // Set equality hides IDENTICAL duplicate rows — assert none exist
    // physically (a revived id whose old rows weren't purged would double
    // its ADC distance on the precomputed path)
    def assertNoDuplicates(p: String): Unit = {
      val dups = spark.read.parquet(ProductQuantizer.resolveCodesDir(spark, p))
        .groupBy(col("__id"), col("__m")).count()
        .where(col("count") > 1).count()
      assert(dups == 0, s"store at $p holds duplicate (__id, __m) code rows")
    }
    val reduced = emb.where(pmod(col("vec_id"), lit(4)) =!= 3)
    // FLAT layout: a TOMBSTONE-sidecar delete — the code files must NOT
    // rewrite (delete cost ∝ batch, not corpus)
    val flat = java.nio.file.Files.createTempDirectory("pq_del_flat").toString
    ProductQuantizer.materialize(emb, "vec_id", "embedding", spec, flat)
    def codeFiles(p: String): Set[String] =
      new java.io.File(s"$p/codes").listFiles().toSeq
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val filesBefore = codeFiles(flat)
    ProductQuantizer.deleteFromMaterialized(
      emb.where(pmod(col("vec_id"), lit(4)) === 3), "vec_id", flat)
    assert(codeFiles(flat) == filesBefore,
      "flat delete must not rewrite the code files (tombstone sidecar)")
    assert(new java.io.File(s"$flat/tombstones").isDirectory)
    val flatRed = java.nio.file.Files.createTempDirectory("pq_del_flat_red").toString
    ProductQuantizer.materialize(reduced, "vec_id", "embedding", spec, flatRed)
    // every read path goes through fromMaterialized, which anti-joins the
    // sidecar: the visible code set equals the reduced rebuild already
    def visibleCodesOf(p: String): Set[(Long, Int, Long)] = {
      val (_, (_, codes)) = ProductQuantizer.fromMaterialized(spark, p)
      codes.select(col("__id"), col("__m"), col("__code"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    assert(visibleCodesOf(flat) == codesOf(flatRed))
    // compaction folds the tombstones into the files; the folded sidecar
    // file is RETAINED one cycle for in-flight readers (r17 snapshot
    // retention) but must be invisible to every read — and a second
    // compaction ages it out entirely
    assert(ProductQuantizer.compactCodes(spark, flat))
    assert(codesOf(flat) == codesOf(flatRed))
    assert(ProductQuantizer.compactCodes(spark, flat, force = true))
    assert(!new java.io.File(s"$flat/tombstones").isDirectory)
    // a flat append after a (new) tombstone delete revives re-inserted ids
    ProductQuantizer.deleteFromMaterialized(
      emb.where(col("vec_id") === 2), "vec_id", flat)
    assert(visibleCodesOf(flat) ==
      codesOf(flatRed) -- codesOf(flatRed).filter(_._1 == 2L))
    ProductQuantizer.appendToMaterialized(
      emb.where(col("vec_id") === 2), "vec_id", "embedding", flat)
    assert(visibleCodesOf(flat) == codesOf(flatRed))
    assertNoDuplicates(flat) // the revive must purge id 2's OLD rows
    // the revive's forced fold leaves the sidecar file retained-but-folded
    // (invisible — the reads above prove it); one more compaction cycle
    // ages it out of the store entirely
    assert(ProductQuantizer.compactCodes(spark, flat, force = true))
    assert(!new java.io.File(s"$flat/tombstones").isDirectory,
      "a sidecar folded a full cycle ago must age out")
    // deleting a codebook-entry id is refused (entries are referenced)
    intercept[IllegalArgumentException] {
      ProductQuantizer.deleteFromMaterialized(
        emb.where(col("vec_id") === 64), "vec_id", flat)
    }
    // IVF-PQ layout: bucket-pruned rewrite, assignment required
    val ivf = java.nio.file.Files.createTempDirectory("pq_del_ivf").toString
    AnnIndex.materialize(emb, "vec_id", "embedding", 64, ivf)
    val comp = java.nio.file.Files.createTempDirectory("pq_del_comp").toString
    ProductQuantizer.materializeIvfPq(emb, "vec_id", "embedding",
      spark.read.parquet(ivf), spec, comp)
    intercept[IllegalArgumentException] { // partitioned layout needs the map
      ProductQuantizer.deleteFromMaterialized(
        emb.where(pmod(col("vec_id"), lit(4)) === 3), "vec_id", comp)
    }
    intercept[IllegalArgumentException] { // flat append would corrupt it
      ProductQuantizer.appendToMaterialized(
        emb.where(col("vec_id") === 3), "vec_id", "embedding", comp)
    }
    // the documented footgun now fails LOUDLY instead of silently
    // no-opping: an assignment missing the deleted ids (e.g. the
    // companion index read back AFTER its own delete) is rejected
    intercept[IllegalArgumentException] {
      ProductQuantizer.deleteFromMaterialized(
        emb.where(pmod(col("vec_id"), lit(4)) === 3), "vec_id", comp,
        assignment = Some(spark.read.parquet(ivf)
          .where(pmod(col("vec_id"), lit(4)) =!= 3)))
    }
    ProductQuantizer.deleteFromMaterialized(
      emb.where(pmod(col("vec_id"), lit(4)) === 3), "vec_id", comp,
      assignment = Some(spark.read.parquet(ivf)))
    val ivfRed = java.nio.file.Files.createTempDirectory("pq_del_ivf_red").toString
    AnnIndex.materialize(reduced, "vec_id", "embedding", 64, ivfRed)
    val compRed = java.nio.file.Files.createTempDirectory("pq_del_comp_red").toString
    ProductQuantizer.materializeIvfPq(reduced, "vec_id", "embedding",
      spark.read.parquet(ivfRed), spec, compRed)
    def bucketedCodesOf(p: String): Set[(Long, Int, Long, Long)] =
      spark.read.parquet(s"$p/codes")
        .select(col("__id"), col("__m"), col("__code"),
          col("__centroid").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(bucketedCodesOf(comp) == bucketedCodesOf(compRed))
    // the IVF-PQ code table's bucket manifest tracks the directory truth
    // through materializeIvfPq + delete
    val manifest = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$comp/codes", "_graft_buckets"))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.toLong).toSeq
    val dirs = new java.io.File(s"$comp/codes").listFiles().toSeq
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("__centroid="))
      .map(_.substring("__centroid=".length).toLong).sorted
    assert(manifest == dirs)
  }

  test("IVF-PQ replayed-assignment maintenance: append and delete equal the trusted-frame path and a rebuild") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    def bucketedCodesOf(p: String): Set[(Long, Int, Long, Long)] =
      spark.read.parquet(s"$p/codes")
        .select(col("__id"), col("__m"), col("__code"),
          col("__centroid").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // full-corpus reference store
    val ivfFull = java.nio.file.Files.createTempDirectory("pq_rp_ivff").toString
    AnnIndex.materialize(emb, "vec_id", "embedding", 64, ivfFull)
    val compFull = java.nio.file.Files.createTempDirectory("pq_rp_compf").toString
    ProductQuantizer.materializeIvfPq(emb, "vec_id", "embedding",
      spark.read.parquet(ivfFull), spec, compFull)
    // half store (evens — covers both codebook-entry and centroid ids),
    // then APPEND the odds with the REPLAYED assignment
    val evens = emb.where(pmod(col("vec_id"), lit(2)) === 0)
    val odds = emb.where(pmod(col("vec_id"), lit(2)) === 1)
    val ivfHalf = java.nio.file.Files.createTempDirectory("pq_rp_ivfh").toString
    AnnIndex.materialize(evens, "vec_id", "embedding", 64, ivfHalf)
    val comp = java.nio.file.Files.createTempDirectory("pq_rp_comp").toString
    ProductQuantizer.materializeIvfPq(evens, "vec_id", "embedding",
      spark.read.parquet(ivfHalf), spec, comp)
    ProductQuantizer.appendToIvfPq(odds, "vec_id", "embedding",
      base = emb, stride = 64, path = comp)
    assert(bucketedCodesOf(comp) == bucketedCodesOf(compFull),
      "replayed append must equal the full-corpus build")
    // DELETE via the replayed assignment (no trusted frame anywhere)
    ProductQuantizer.deleteFromIvfPq(
      emb.where(pmod(col("vec_id"), lit(4)) === 3), "vec_id", "embedding",
      base = emb, stride = 64, path = comp)
    val reduced = emb.where(pmod(col("vec_id"), lit(4)) =!= 3)
    val ivfRed = java.nio.file.Files.createTempDirectory("pq_rp_ivfr").toString
    AnnIndex.materialize(reduced, "vec_id", "embedding", 64, ivfRed)
    val compRed = java.nio.file.Files.createTempDirectory("pq_rp_compr").toString
    ProductQuantizer.materializeIvfPq(reduced, "vec_id", "embedding",
      spark.read.parquet(ivfRed), spec, compRed)
    assert(bucketedCodesOf(comp) == bucketedCodesOf(compRed),
      "replayed delete must equal the reduced-corpus build")
    // appending codebook-entry or centroid ids is refused (frozen sets)
    intercept[IllegalArgumentException] {
      ProductQuantizer.appendToIvfPq(emb.where(col("vec_id") === 16),
        "vec_id", "embedding", base = emb, stride = 64, path = comp)
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.appendToIvfPq(emb.where(col("vec_id") === 64),
        "vec_id", "embedding", base = emb, stride = 64, path = comp)
    }
  }

  test("precomputed (codebooks, codes) probes equal the inline path") {
    val cb = ProductQuantizer.codebooks(emb, "vec_id", "embedding", spec)
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", cb, spec)
    val pre = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(7), k = 10, spec, overfetch = 100,
        precomputed = Some((cb, codes)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = ProductQuantizer.adcRerankTopK(emb, "vec_id", "embedding",
        qvec(7), k = 10, spec, overfetch = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pre == inline)
  }

  test("trained codebooks: same entry count, lower inertia, higher recall than stride on clustered data") {
    import graft.ops.ProductQuantizer
    // clustered fixture: 8 well-separated centers, 64 members each with
    // moderate noise — the distribution PQ exists for (uniform data, like
    // the synthetic embeddings table, has no structure for k-means to
    // learn, which is why this spec builds its own corpus)
    def u(x: Long): Double =
      graft.util.Hashing.splitmix64(x).toDouble / Long.MaxValue.toDouble
    val dim = 64
    val rows = (0 until 512).map { i =>
      val c = i / 64
      (i.toLong, (0 until dim).map(p => u(c * 7919L + p) + 0.35 * u(i * 104729L + p)).toArray)
    }
    val df = spark.createDataFrame(rows).toDF("id", "v")
    val sp = PqSpec(m = 8, dsub = 8, stride = 32)
    val strideCb = ProductQuantizer.codebooks(df, "id", "v", sp)
    val trainedCb = ProductQuantizer.trainedCodebooks(df, "id", "v", sp, iters = 2)
    assert(strideCb.count() == trainedCb.count(), "training must not drop entries")

    // k-means invariant: total quantization error (sum of min distances to
    // any entry, per subspace) does not rise
    def inertia(cb: org.apache.spark.sql.DataFrame): Double = {
      val sub = df.select(col("id"),
          posexplode(array((0 until sp.m).map(s =>
            slice(col("v"), s * sp.dsub + 1, sp.dsub)): _*)))
        .withColumnRenamed("pos", "__m").withColumnRenamed("col", "__sv")
      sub.join(broadcast(cb), Seq("__m"))
        .select(col("id"), col("__m"),
          graft.functions.array_distance(col("__sv"), col("__cbvec")).as("d"))
        .groupBy("id", "__m").agg(min("d").as("d"))
        .agg(sum("d")).head().getDouble(0)
    }
    val (i0, i2) = (inertia(strideCb), inertia(trainedCb))
    assert(i2 <= i0 + 1e-6, s"training raised quantization error: $i0 -> $i2")

    def bruteOf(q: Array[Double]): Set[Long] =
      df.select(col("id"),
          graft.functions.array_cosine_distance(col("v"), typedLit(q.toSeq)).as("d"))
        .orderBy(col("d").asc_nulls_last, col("id").asc)
        .limit(10).collect().map(_.getLong(0)).toSet
    def recallWith(cb: org.apache.spark.sql.DataFrame, q: Array[Double],
        overfetch: Int): Int = {
      val codes = ProductQuantizer.encode(df, "id", "v", cb, sp)
      ProductQuantizer.adcRerankTopK(df, "id", "v", q, k = 10, sp,
          overfetch = overfetch, precomputed = Some((cb, codes)))
        .collect().map(_.getLong(0)).toSet.intersect(bruteOf(q)).size
    }
    // moderate overfetch (40 for k=10) makes recall track ADC ranking
    // quality directly. Everything here is deterministic (splitmix64 data,
    // deterministic training/encode), so the aggregate is a pinned value,
    // not a flaky sample: trained must average >= 9/10 over the query set
    // on a fixture where the untrained init measurably scores lower.
    val qids = Seq(7, 137, 341)
    val rs = qids.map(q => recallWith(strideCb, rows(q)._2, 40)).sum
    val rt = qids.map(q => recallWith(trainedCb, rows(q)._2, 40)).sum
    assert(rt >= 9 * qids.size, s"trained recall@10 total = $rt/${10 * qids.size}")
    assert(rs < rt, s"stride recall $rs not below trained $rt — fixture has no training signal")

    // the trained build persists through the at-rest layout unchanged:
    // materialize(trainedIters) -> fromMaterialized == the inline trained path
    val path = java.nio.file.Files.createTempDirectory("pq_trained_mat").toString
    ProductQuantizer.materialize(df, "id", "v", sp, path, trainedIters = 2)
    val (_, pre) = ProductQuantizer.fromMaterialized(spark, path)
    val viaDisk = ProductQuantizer.adcRerankTopK(df, "id", "v", rows(7)._2,
        k = 10, sp, overfetch = 40, precomputed = Some(pre))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = ProductQuantizer.adcRerankTopK(df, "id", "v", rows(7)._2,
        k = 10, sp, overfetch = 40,
        precomputed = Some((trainedCb,
          ProductQuantizer.encode(df, "id", "v", trainedCb, sp))))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaDisk == inline, "materialized trained index diverged from inline")
  }

  test("materializeIvfPq: at-rest probe equals the inline composition and prunes both scans") {
    val annPath = java.nio.file.Files.createTempDirectory("ivfpq_ann").toString
    AnnIndex.materialize(emb, "vec_id", "embedding", 64, annPath)
    val idx = AnnIndex.fromMaterialized(emb, "vec_id", "embedding", 64, annPath)
    val pqPath = java.nio.file.Files.createTempDirectory("ivfpq_pq").toString
    ProductQuantizer.materializeIvfPq(emb, "vec_id", "embedding",
      spark.read.parquet(annPath), spec, pqPath)
    val got = ProductQuantizer.probeIvfPqTopK(idx, "vec_id", "embedding",
      pqPath, qvec(3), k = 10, nprobe = 4, overfetch = 100, spark = Some(spark))
    val gotRows = got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // inline equivalent: full-corpus codebooks + codes, ADC restricted to
    // the probed rows, rerank over the probed rows
    val cb = ProductQuantizer.codebooks(emb, "vec_id", "embedding", spec)
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", cb, spec)
    val probedIds = idx.probedRows(qvec(3), 4)
      .select(col("vec_id").cast("long").as("__id"))
    val pruned = codes.join(probedIds, Seq("__id"), "left_semi")
    val want = ProductQuantizer.adcRerankTopK(
        idx.probedRows(qvec(3), 4), "vec_id", "embedding", qvec(3),
        k = 10, spec, overfetch = 100, precomputed = Some((cb, pruned)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotRows == want, "at-rest IVF-PQ probe diverged from inline composition")
    // both the code scan and the float scan must carry a runtime partition
    // filter on __centroid — the probe never reads unprobed buckets
    val executed = got.queryExecution.executedPlan.toString
    assert(executed.contains("dynamicpruning") ||
      executed.contains("PartitionFilters: [isnotnull(__centroid"),
      s"no partition pruning on the IVF-PQ probe:\n$executed")
    // geometry marker is shared with the plain PQ layout
    intercept[IllegalArgumentException] {
      ProductQuantizer.fromMaterialized(spark, pqPath,
        expect = Some(ProductQuantizer.PqSpec(4, 16, 16)))
    }
  }

  test("IVF-PQ composition: PQ over probedRows; all-bucket probe is exact") {
    val idx = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    val nCentroids = 500 / 64 + 1
    // all buckets + full overfetch -> brute force (tier composition loses
    // nothing when both tiers are un-truncated)
    val all = ProductQuantizer.adcRerankTopK(
        idx.probedRows(qvec(3), nCentroids), "vec_id", "embedding",
        qvec(3), k = 10, spec, overfetch = 500)
      .collect().map(_.getLong(0)).toSeq
    assert(all == bruteIds(qvec(3), 10))
    // pruned probe: recall floor vs brute force (uniform synthetic data
    // spreads true neighbors across buckets, so the IVF prune itself costs
    // recall; 4 of 8 buckets + PQ keeps a majority of the true top-10)
    val pruned = ProductQuantizer.adcRerankTopK(
        idx.probedRows(qvec(3), 4), "vec_id", "embedding",
        qvec(3), k = 10, spec, overfetch = 150)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.intersect(bruteIds(qvec(3), 10).toSet).size >= 6,
      s"IVF-PQ recall too low: $pruned")
  }
}

/** Graph-ANN tier (ops/GraphAnn): bounded-degree navigable graph, beam
  * search probe. Recall vs brute force at IVF-equivalent probe cost,
  * determinism, materialize round-trip, geometry guard.
  */
class GraphAnnSpec extends SparkTestBase {
  import graft.ops.{AnnIndex, GraphAnn}

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def qvec(id: Long): Array[Double] =
    emb.where(col("vec_id") === id).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray

  private def bruteIds(q: Array[Double], k: Int): Seq[Long] =
    emb.select(col("vec_id"),
        graft.functions.array_cosine_distance(col("embedding"),
          typedLit(q.toSeq)).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id").asc)
      .limit(k).collect().map(_.getLong(0)).toSeq

  test("edge table is bounded-degree and two-family") {
    val edges = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 64)
    val deg = edges.groupBy("src").count()
    assert(deg.where(col("count") > 2 * GraphAnn.DefaultDegree).count() == 0,
      "a node exceeded bucket-degree + centroid-degree")
    // centroids carry BOTH families: bucket-mate edges and centroid edges
    val centDeg = deg.where(col("src") % 64 === 0)
      .agg(min("count")).head().getLong(0)
    assert(centDeg > GraphAnn.DefaultDegree,
      s"centroid out-degree $centDeg has no centroid-layer edges")
  }

  test("beam search: recall@10 vs brute force at IVF-equivalent cost; deterministic") {
    // the uniform synthetic corpus is graph navigation's WORST case
    // (neighbor-of-neighbor correlation is weakest for i.i.d. uniform
    // vectors at dim 64), so the bar here is parity-class with the IVF
    // probe at comparable scored-vector cost, not the production recall —
    // the clustered-fixture test below pins that
    val edges = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 64)
    val ivf = AnnIndex.build(emb, "vec_id", "embedding", stride = 64)
    var (graphTotal, ivfTotal) = (0, 0)
    for (id <- Seq(1L, 7L, 42L)) {
      val brute = bruteIds(qvec(id), 10).toSet
      val graph = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
          qvec(id), k = 10, stride = 64)
        .collect().map(_.getLong(0)).toSet
      val ivfHits = ivf.probeTopK(qvec(id), 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSet
      val (rg, ri) = (graph.intersect(brute).size, ivfHits.intersect(brute).size)
      info(s"q=$id graph=$rg ivf(nprobe=4)=$ri")
      assert(rg >= 5, s"query $id: graph recall@10 = $rg")
      graphTotal += rg; ivfTotal += ri
    }
    assert(graphTotal >= ivfTotal - 3,
      s"graph total $graphTotal not parity-class with IVF $ivfTotal")
    // determinism: the probe is a pure function of (corpus, edges, query)
    val a = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
      qvec(7), k = 10, stride = 64).collect().toSeq
    val b = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
      qvec(7), k = 10, stride = 64).collect().toSeq
    assert(a == b)
  }

  test("beam search on clustered data: recall@10 >= 9/10 average") {
    // the distribution graph ANN exists for: well-separated clusters, the
    // trained-PQ fixture recipe. Entry centroids route to the query's
    // cluster, bucket-kNN edges walk within it.
    def u(x: Long): Double =
      graft.util.Hashing.splitmix64(x).toDouble / Long.MaxValue.toDouble
    val rows = (0 until 512).map { i =>
      val c = i / 64
      (i.toLong, (0 until 64).map(p => u(c * 7919L + p) + 0.35 * u(i * 104729L + p)).toArray)
    }
    val df = spark.createDataFrame(rows).toDF("id", "v")
    val edges = GraphAnn.buildEdges(df, "id", "v", stride = 64)
    def brute(q: Array[Double]): Set[Long] =
      df.select(col("id"),
          graft.functions.array_cosine_distance(col("v"), typedLit(q.toSeq)).as("d"))
        .orderBy(col("d").asc_nulls_last, col("id").asc)
        .limit(10).collect().map(_.getLong(0)).toSet
    val qids = Seq(7, 137, 341)
    val total = qids.map { qid =>
      val got = GraphAnn.beamSearchTopK(df, "id", "v", edges, rows(qid)._2,
          k = 10, stride = 64)
        .collect().map(_.getLong(0)).toSet
      val r = got.intersect(brute(rows(qid)._2)).size
      info(s"q=$qid recall=$r")
      r
    }.sum
    assert(total >= 9 * qids.size, s"clustered recall total $total/${10 * qids.size}")
  }

  test("point probe is row-identical to the join-shape probe") {
    val edges = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 64)
    for (id <- Seq(1L, 7L, 42L)) {
      val a = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
        qvec(id), k = 10, stride = 64).collect().toSeq
      val b = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding", edges,
        qvec(id), k = 10, stride = 64).collect().toSeq
      assert(a == b, s"query $id: point probe diverged from join shape")
    }
    // non-default geometry: narrower beam, fewer rounds
    val a = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
      qvec(3), k = 5, stride = 64, beam = 4, rounds = 2).collect().toSeq
    val b = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding", edges,
      qvec(3), k = 5, stride = 64, beam = 4, rounds = 2).collect().toSeq
    assert(a == b)
  }

  test("batched beam search is row-identical per query to the single-query shapes") {
    val sp = spark
    import sp.implicits._
    val edges = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 64)
    val qids = Seq(1L, 7L, 42L)
    val queries = emb.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
    val batch = GraphAnn.beamSearchTopKBatch(emb, "vec_id", "embedding",
        edges, queries, "qid", "qv", k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for (id <- qids) {
      val single = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
          qvec(id), k = 10, stride = 64)
        .collect().zipWithIndex
        .map { case (r, i) => (id, i + 1L, r.getLong(0), r.getDouble(1)) }.toSeq
      assert(batch(id).toSeq.sortBy(_._2) == single,
        s"query $id: batch probe diverged from single-query shape")
    }
    // non-default geometry + a query whose convergence round differs from
    // the others must freeze at ITS round, not the batch's last
    val queries2 = emb.where(col("vec_id").isin(3L, 11L))
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
    val batch2 = GraphAnn.beamSearchTopKBatch(emb, "vec_id", "embedding",
        edges, queries2, "qid", "qv", k = 5, stride = 64, beam = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for (id <- Seq(3L, 11L)) {
      val single = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
          qvec(id), k = 5, stride = 64, beam = 4, rounds = 2)
        .collect().map(r => (id, r.getLong(0), r.getDouble(1))).toSeq
      assert(batch2(id).toSeq == single)
    }
    // the router sends gate-sized batches down the driver point-probe path;
    // the engine-side JOIN shape (the >beam scale path) must stay
    // row-identical to it on the same queries
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val joinShape = GraphAnn.beamSearchTopKBatchJoin(emb, "vec_id",
      "embedding", edges, queries, "qid", "qv", k = 10, stride = 64)
    assert(rows(joinShape) ==
      rows(GraphAnn.beamSearchTopKBatch(emb, "vec_id", "embedding", edges,
        queries, "qid", "qv", k = 10, stride = 64)),
      "driver-routed batch diverged from the join shape")
    // a NULL query id must NOT be read as long 0 on the driver route (it
    // would alias with a real query 0) — the router stays on the join shape
    val withNull = queries
      .select(when(col("qid") === 7L, lit(null).cast("long"))
        .otherwise(col("qid")).as("qid"), col("qv"))
    def rowsN(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rowsN(GraphAnn.beamSearchTopKBatch(emb, "vec_id", "embedding",
        edges, withNull, "qid", "qv", k = 10, stride = 64)) ==
      rowsN(GraphAnn.beamSearchTopKBatchJoin(emb, "vec_id", "embedding",
        edges, withNull, "qid", "qv", k = 10, stride = 64)),
      "NULL-qid batch diverged from the join shape")
  }

  test("tiered centroid layer: parity-class recall, bounded degree, geometry guard") {
    // stride 16 -> ~31 centroids, superStride 64 -> ~8 super-centroids on
    // the 500-vector corpus: small, but exercises all three edge levels
    val flat = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 16)
    val tiered = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 16,
      degree = GraphAnn.DefaultDegree, superStride = 64)
    var (flatTotal, tierTotal) = (0, 0)
    for (id <- Seq(1L, 7L, 42L)) {
      val brute = bruteIds(qvec(id), 10).toSet
      def recall(edges: org.apache.spark.sql.DataFrame): Int =
        GraphAnn.pointProbeTopK(emb, "vec_id", "embedding", edges, qvec(id),
            k = 10, stride = 16)
          .collect().map(_.getLong(0)).toSet.intersect(brute).size
      val (rf, rt) = (recall(flat), recall(tiered))
      info(s"q=$id flat=$rf tiered=$rt")
      flatTotal += rf; tierTotal += rt
    }
    assert(tierTotal >= flatTotal - 3,
      s"tiered recall $tierTotal not parity-class with flat $flatTotal")
    // a super-centroid carries at most member + centroid + top families
    val maxDeg = tiered.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= 3L * GraphAnn.DefaultDegree, s"out-degree $maxDeg")
    // geometry marker includes the tier and mismatches fail fast
    val path = java.nio.file.Files.createTempDirectory("graph_tier").toString
    GraphAnn.materialize(emb, "vec_id", "embedding", 16,
      GraphAnn.DefaultDegree, path, superStride = 64)
    val reopened = GraphAnn.fromMaterialized(spark, path, 16,
      GraphAnn.DefaultDegree, superStride = 64)
    assert(reopened.count() == tiered.count())
    intercept[IllegalArgumentException] {
      GraphAnn.fromMaterialized(spark, path, 16, GraphAnn.DefaultDegree)
    }
  }

  test("wider beam / more rounds converge toward brute force") {
    val edges = GraphAnn.buildEdges(emb, "vec_id", "embedding", stride = 64,
      degree = 8)
    val brute = bruteIds(qvec(3), 10).toSet
    val recalls = Seq((4, 1), (8, 2), (16, 3), (32, 4)).map { case (beam, rounds) =>
      GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges, qvec(3),
          k = 10, stride = 64, beam = beam, rounds = rounds)
        .collect().map(_.getLong(0)).toSet.intersect(brute).size
    }
    info(s"recall ladder: $recalls")
    assert(recalls.last >= 9, s"widest probe recall ${recalls.last}")
    assert(recalls.head <= recalls.last, s"ladder not improving: $recalls")
  }

  test("convergence early-exit: a raised round cap costs nothing once converged") {
    // clustered fixture (the case graph ANN exists for): the greedy walk
    // converges in a few rounds, so a deep cap must EARLY-EXIT with rows
    // identical to the capped run — `rounds` is a cap, not the cost. This
    // is the HNSW termination rule, shared by both probe shapes and the
    // SQL oracle's per-round frontier guard.
    def u(x: Long): Double =
      graft.util.Hashing.splitmix64(x).toDouble / Long.MaxValue.toDouble
    val rows = (0 until 512).map { i =>
      val c = i / 64
      (i.toLong, (0 until 64).map(p => u(c * 7919L + p) + 0.35 * u(i * 104729L + p)).toArray)
    }
    val df = spark.createDataFrame(rows).toDF("id", "v")
    val edges = GraphAnn.buildEdges(df, "id", "v", stride = 64)
    val q = rows(137)._2
    val capped = GraphAnn.pointProbeTopK(df, "id", "v", edges, q,
      k = 10, stride = 64, rounds = 4).collect().toSeq
    val cappedRounds = GraphAnn.lastProbeRounds
    val deep = GraphAnn.pointProbeTopK(df, "id", "v", edges, q,
      k = 10, stride = 64, rounds = 16).collect().toSeq
    val deepRounds = GraphAnn.lastProbeRounds
    info(s"rounds executed: cap4=$cappedRounds cap16=$deepRounds")
    assert(deep == capped, "deep cap changed the converged result")
    assert(deepRounds < 16, "16-round cap never early-exited on clustered data")
    // the join shape exits at the same round with the same rows
    val joinDeep = GraphAnn.beamSearchTopK(df, "id", "v", edges, q,
      k = 10, stride = 64, rounds = 16).collect().toSeq
    assert(joinDeep == deep, "join shape diverged under early exit")
    assert(GraphAnn.lastProbeRounds == deepRounds,
      "join shape exited at a different round than the point probe")
  }

  test("materialized edges probe identically; geometry mismatch rejected") {
    val path = java.nio.file.Files.createTempDirectory("graph_mat").toString
    GraphAnn.materialize(emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, path)
    val edges = GraphAnn.fromMaterialized(spark, path, 64, GraphAnn.DefaultDegree)
    val got = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding", edges,
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = GraphAnn.beamSearchTopK(emb, "vec_id", "embedding",
        GraphAnn.buildEdges(emb, "vec_id", "embedding", 64),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
    intercept[IllegalArgumentException] {
      GraphAnn.fromMaterialized(spark, path, 64, 16)
    }
  }

  test("graph compact: file counts collapse after append/delete cycles, probes unchanged") {
    val p = java.nio.file.Files.createTempDirectory("graph_compact").toString
    // start from a third of the corpus, then append the rest in 6 small
    // batches: assign/ gains one file per batch per touched bucket
    GraphAnn.materialize(emb.where(pmod(col("vec_id"), lit(3)) === 0),
      "vec_id", "embedding", 64, GraphAnn.DefaultDegree, p)
    (0 until 6).foreach { i =>
      GraphAnn.appendToMaterialized(
        emb.where(pmod(col("vec_id"), lit(3)) =!= 0)
          .where(pmod(col("vec_id"), lit(64)) =!= 0)
          .where(pmod(col("vec_id"), lit(6)) === i),
        emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, p)
    }
    def maxFiles(table: String): Int =
      new java.io.File(table).listFiles().toSeq.filter(_.isDirectory)
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles(s"$p/assign") > 2,
      "fixture must actually fragment the assignment table")
    val edges = GraphAnn.fromMaterialized(spark, p, 64, GraphAnn.DefaultDegree)
    val before = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding", edges,
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def rowsOf(table: String, cols: Seq[String]): Set[Seq[Any]] =
      spark.read.parquet(table).select(cols.map(col): _*).collect()
        .map(_.toSeq.map {
          case v: Int => v.toLong // partition col may infer int
          case v => v
        }).toSet
    val assignBefore = rowsOf(s"$p/assign", Seq("__nid", "__centroid"))
    val edgesBefore = rowsOf(s"$p/edges", Seq("src", "dst", "__bucket"))
    val (ce, ca) = GraphAnn.compact(spark, p, maxFilesPerBucket = 2)
    assert(ca.nonEmpty, "over-threshold assign buckets must compact")
    assert(maxFiles(s"$p/assign") <= 2)
    // re-filing changes NOTHING: same rows, same probe
    assert(rowsOf(s"$p/assign", Seq("__nid", "__centroid")) == assignBefore)
    assert(rowsOf(s"$p/edges", Seq("src", "dst", "__bucket")) == edgesBefore)
    val after = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, p, 64, GraphAnn.DefaultDegree),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before)
    // manifests still match directory truth on both tables
    def manifestOf(table: String): Seq[Long] =
      java.nio.file.Files.readString(
          java.nio.file.Paths.get(table, "_graft_buckets"))
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSeq
    def dirsOf(table: String, partCol: String): Seq[Long] =
      new java.io.File(table).listFiles().toSeq.filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith(partCol + "="))
        .map(_.substring(partCol.length + 1).toLong).sorted
    assert(manifestOf(s"$p/assign") == dirsOf(s"$p/assign", "__centroid"))
    assert(manifestOf(s"$p/edges") == dirsOf(s"$p/edges", "__bucket"))
    // second call is a no-op (nothing over threshold)
    val (ce2, ca2) = GraphAnn.compact(spark, p, maxFilesPerBucket = 2)
    assert(ce2.isEmpty && ca2.isEmpty)
    assert(ce.isEmpty || maxFiles(s"$p/edges") <= 2)
  }

  test("graph incremental insert: half materialize + half append == full materialize") {
    val half = java.nio.file.Files.createTempDirectory("graph_inc").toString
    val full = java.nio.file.Files.createTempDirectory("graph_full").toString
    // even half first (every id divisible by stride 64 is even, so the
    // half-build's centroid set == the full build's), then the odd batch
    GraphAnn.materialize(emb.where(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding", 64, GraphAnn.DefaultDegree, half)
    GraphAnn.appendToMaterialized(emb.where(pmod(col("vec_id"), lit(2)) === 1),
      emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, half)
    GraphAnn.materialize(emb, "vec_id", "embedding", 64,
      GraphAnn.DefaultDegree, full)
    def edgeSet(p: String): Set[(Long, Long)] =
      GraphAnn.fromMaterialized(spark, p, 64, GraphAnn.DefaultDegree)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // row-identical artifact — the append IS the rebuild for touched buckets
    assert(edgeSet(half) == edgeSet(full))
    // and the probe over the appended artifact matches the full one exactly
    val gotP = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, half, 64, GraphAnn.DefaultDegree),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wantP = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, full, 64, GraphAnn.DefaultDegree),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotP == wantP)
    // a batch that would add a centroid is rejected (bucket geometry frozen)
    intercept[IllegalArgumentException] {
      GraphAnn.appendToMaterialized(emb.where(col("vec_id") === 128),
        emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, half)
    }
    // opening a tiered artifact for append with the wrong superStride
    // (here: the flat default) is refused — geometry is authoritative
    val tiered = java.nio.file.Files.createTempDirectory("graph_tier_inc").toString
    GraphAnn.materialize(emb, "vec_id", "embedding", 64,
      GraphAnn.DefaultDegree, tiered, superStride = 128)
    intercept[IllegalArgumentException] {
      GraphAnn.appendToMaterialized(emb.where(col("vec_id") === 1),
        emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, tiered)
    }
    // the bucket manifests exist and list exactly the partition dirs
    def manifest(table: String): Seq[Long] =
      java.nio.file.Files.readString(
          java.nio.file.Paths.get(table, "_graft_buckets"))
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSeq
    def dirs(table: String, partCol: String): Seq[Long] = {
      val d = new java.io.File(table).listFiles().toSeq
      d.filter(_.isDirectory).map(_.getName)
        .filter(_.startsWith(partCol + "="))
        .map(_.substring(partCol.length + 1).toLong).sorted
    }
    assert(manifest(s"$half/edges") == dirs(s"$half/edges", "__bucket"))
    assert(manifest(s"$half/assign") == dirs(s"$half/assign", "__centroid"))
  }

  test("graph delete: full build + batch delete == reduced-corpus build") {
    val del = java.nio.file.Files.createTempDirectory("graph_del").toString
    val red = java.nio.file.Files.createTempDirectory("graph_red").toString
    GraphAnn.materialize(emb, "vec_id", "embedding", 64,
      GraphAnn.DefaultDegree, del)
    GraphAnn.deleteFromMaterialized(emb.where(pmod(col("vec_id"), lit(4)) === 3),
      emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, del)
    val reduced = emb.where(pmod(col("vec_id"), lit(4)) =!= 3)
    GraphAnn.materialize(reduced, "vec_id", "embedding", 64,
      GraphAnn.DefaultDegree, red)
    def edgeSet(p: String): Set[(Long, Long)] =
      GraphAnn.fromMaterialized(spark, p, 64, GraphAnn.DefaultDegree)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // row-identical artifact: deletion may PROMOTE edges the stored
    // top-degree ranked out — the from-scratch touched-bucket recompute
    // must capture them (a filter of the stored edges would not)
    assert(edgeSet(del) == edgeSet(red))
    val gotP = GraphAnn.pointProbeTopK(reduced, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, del, 64, GraphAnn.DefaultDegree),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wantP = GraphAnn.pointProbeTopK(reduced, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, red, 64, GraphAnn.DefaultDegree),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotP == wantP)
    // no deleted id survives anywhere in the artifact (src or dst)
    val ids = GraphAnn.fromMaterialized(spark, del, 64, GraphAnn.DefaultDegree)
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .where(pmod(col("id"), lit(4)) === 3)
    assert(ids.isEmpty)
    // deleting a centroid-level id is refused (geometry frozen)
    intercept[IllegalArgumentException] {
      GraphAnn.deleteFromMaterialized(emb.where(col("vec_id") === 128),
        emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, del)
    }
  }

  test("graph delete clears emptied bucket partitions") {
    val sp = spark
    import sp.implicits._
    // two buckets: centroid 0 with one member 1 (nearby), centroid 64
    // with members 65, 66; deleting id 1 empties bucket 0's edge set
    def v(x: Double): Array[Float] =
      Array.tabulate(4)(i => if (i == 0) 1f else (x * (i + 1)).toFloat)
    val tiny = Seq(
      (0L, v(0.0)), (1L, v(0.01)),
      (64L, v(5.0)), (65L, v(5.01)), (66L, v(5.02))
    ).toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("graph_del_tiny").toString
    GraphAnn.materialize(tiny, "vec_id", "embedding", 64, 2, p)
    GraphAnn.deleteFromMaterialized(tiny.where(col("vec_id") === 1),
      tiny, "vec_id", "embedding", 64, 2, p)
    val red = java.nio.file.Files.createTempDirectory("graph_red_tiny").toString
    GraphAnn.materialize(tiny.where(col("vec_id") =!= 1),
      "vec_id", "embedding", 64, 2, red)
    def edgeSet(path: String): Set[(Long, Long)] =
      GraphAnn.fromMaterialized(spark, path, 64, 2)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(p) == edgeSet(red))
    // the emptied bucket's edge directory is gone and the manifest agrees
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$p/edges", "__bucket=0")))
    val manifest = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$p/edges", "_graft_buckets"))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
    assert(!manifest.contains(0L))
  }

  test("tiered graph incremental insert: half + append == full tiered build") {
    val half = java.nio.file.Files.createTempDirectory("graph_tinc").toString
    val full = java.nio.file.Files.createTempDirectory("graph_tfull").toString
    // even half first: ids divisible by stride 64 (and so by superStride
    // 128) are all even — the half build's centroid AND super sets equal
    // the full build's, the frozen-geometry contract
    GraphAnn.materialize(emb.where(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding", 64, GraphAnn.DefaultDegree, half,
      superStride = 128)
    GraphAnn.appendToMaterialized(emb.where(pmod(col("vec_id"), lit(2)) === 1),
      emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, half,
      superStride = 128)
    GraphAnn.materialize(emb, "vec_id", "embedding", 64,
      GraphAnn.DefaultDegree, full, superStride = 128)
    def edgeSet(p: String): Set[(Long, Long)] =
      GraphAnn.fromMaterialized(spark, p, 64, GraphAnn.DefaultDegree,
          superStride = 128)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // row-identical artifact: upper levels frozen by construction, member
    // level spliced under the build's exact hierarchical assignment rule
    assert(edgeSet(half) == edgeSet(full))
    val gotP = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, half, 64, GraphAnn.DefaultDegree,
          superStride = 128),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wantP = GraphAnn.pointProbeTopK(emb, "vec_id", "embedding",
        GraphAnn.fromMaterialized(spark, full, 64, GraphAnn.DefaultDegree,
          superStride = 128),
        qvec(5), k = 10, stride = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotP == wantP)
    // and the tiered DELETE path: removing the 4k+3 rows from the spliced
    // artifact equals a reduced-corpus tiered build (same frozen-geometry
    // replay, survivors-only bucket recompute)
    GraphAnn.deleteFromMaterialized(emb.where(pmod(col("vec_id"), lit(4)) === 3),
      emb, "vec_id", "embedding", 64, GraphAnn.DefaultDegree, half,
      superStride = 128)
    val redT = java.nio.file.Files.createTempDirectory("graph_tred").toString
    GraphAnn.materialize(emb.where(pmod(col("vec_id"), lit(4)) =!= 3),
      "vec_id", "embedding", 64, GraphAnn.DefaultDegree, redT,
      superStride = 128)
    assert(edgeSet(half) == edgeSet(redT))
  }
}

/** sim_join_lsh's documented check (it has no SQL oracle: the hyperplane
  * literals are impractical to replicate in DuckDB): every emitted pair is
  * exact-verified (precision 1.0 by construction — assert it), and recall
  * against the exact broadcast join stays above a measured floor.
  */
class LshRecallSpec extends SparkTestBase {
  test("sign-LSH cosine join: precision 1.0, recall >= 0.5 vs exact join") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tau = 0.55
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.ops.SimilarityJoin.cosineJoinBroadcast(
      emb, "vec_id", "embedding", tau))
    val lsh = pairs(graft.ops.SimilarityJoin.cosineJoinLsh(
      emb, "vec_id", "embedding", tau, dim))
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact.nonEmpty, "exact join returned no pairs — tau too tight for this data")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall below floor (lsh=${lsh.size}, exact=${exact.size})")
  }
}

/** Sketch error bounds: HLL within its configured relative standard
  * deviation of the exact count (the sketch_stats query asserts the same
  * bound as an oracle-checked boolean; this pins it independently).
  */
class SketchBoundsSpec extends SparkTestBase {
  test("approx_count_distinct stays within 4 rsd of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val rsd = 0.05
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd).as("approx"),
        count_distinct(col("l_orderkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 4 * rsd,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
