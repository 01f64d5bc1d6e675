package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, SimilarityJoin, SnapshotDelta}

/** Snapshot diffing, minhash calibration, and labelled retrieval eval —
  * the round-10 maintenance/QA additions.
  */
class MaintenanceEvalSpec extends SparkTestBase {

  // ---- SnapshotDelta ------------------------------------------------------

  test("delta classifies added/removed/changed/unchanged; NULL text compares equal") {
    val sp = spark
    import sp.implicits._
    val old = Seq(
      (1L, "same"), (2L, "was this"), (3L, "going away"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same"), (2L, "now this"), (4L, "brand new"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = SnapshotDelta.delta(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"), got)
  }

  test("workQueue carries only added+changed new-snapshot rows") {
    val sp = spark
    import sp.implicits._
    val old = Seq((1L, "same"), (2L, "was")).toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "now"), (3L, "new")).toDF("doc_id", "text")
    val got = SnapshotDelta.workQueue(old, neu, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "now"), (3L, "new")), got)
  }

  // ---- minhashCalibration -------------------------------------------------

  test("calibration: identical docs estimate 1.0 with zero error") {
    val sp = spark
    import sp.implicits._
    val sh = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")), // identical to 1
      (3L, Seq("x y z", "y z w", "z w v")) // disjoint: never a candidate
    ).toDF("doc_id", "sh")
    val rows = Dedup.minhashCalibration(sh, "doc_id", "sh").collect()
    assert(rows.length == 1, rows.toSeq)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)), r)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0, r)
  }

  test("calibration: est is the k-agreement fraction, err = |est - jaccard|") {
    val sp = spark
    import sp.implicits._
    // overlapping but not identical sets; share enough to collide in a band
    val base = (0 until 30).map(i => s"tok$i tok${i + 1} tok${i + 2}")
    val sh = Seq(
      (1L, base),
      (2L, base.drop(2)) // jaccard = 28/30
    ).toDF("doc_id", "sh")
    val rows = Dedup.minhashCalibration(sh, "doc_id", "sh").collect()
    if (rows.nonEmpty) { // banding may or may not fire; if it does, check math
      val r = rows.head
      val est = r.getDouble(2); val jac = r.getDouble(3); val err = r.getDouble(4)
      assert(est >= 0.0 && est <= 1.0 && (est * 16).isWhole, r)
      assert(math.abs(jac - 28.0 / 30.0) < 1e-12, r)
      assert(err == math.abs(est - jac), r)
    }
  }

  // ---- softDedupWeights ---------------------------------------------------

  test("soft dedup: inverse-cluster-size ppm weights, singletons at 10^6") {
    val sp = spark
    import sp.implicits._
    val docs = (0L to 5L).map(i => Tuple1(i)).toDF("doc_id")
    // cluster {0,1,2} via chain 0-1, 1-2; pair {3,4}; 5 singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val got = Dedup.softDedupWeights(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((3L, 333333L)) && got(1L) == ((3L, 333333L)) &&
      got(2L) == ((3L, 333333L)), got)
    assert(got(3L) == ((2L, 500000L)) && got(4L) == ((2L, 500000L)), got)
    assert(got(5L) == ((1L, 1000000L)), got)
    // total weight ~= number of effective documents: 3 clusters worth
    val total = got.values.map(_._2).sum
    assert(total == 3 * 333333L + 2 * 500000L + 1000000L, total)
  }

  // ---- sharded export -----------------------------------------------------

  test("sharded export: manifest matches the on-disk shards, round-trip is lossless") {
    val sp = spark
    import sp.implicits._
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = graft.util.TempDirs.create("shard_spec")
    val manifest = graft.sources.CorpusIO.writeSharded(docs, "doc_id", 4, out)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    assert(manifest.values.map(_._1).sum == 100L)
    // every shard dir exists and its row count matches the manifest
    // (partition-dir columns read back as int — cast to compare)
    val back = sp.read.parquet(out)
      .withColumn("shard", col("shard").cast("long"))
    val onDisk = back.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(onDisk == manifest.view.mapValues(_._1).toMap, onDisk)
    // round-trip: no rows lost or duplicated
    assert(back.select("doc_id").distinct().count() == 100L)
    // the checksum verifies against an independent recomputation per shard
    val recheck = back
      .withColumn("h", conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long"))
      .groupBy("shard").agg(expr("bit_xor(h)").as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recheck == manifest.view.mapValues(_._2).toMap, recheck)
  }

  // ---- retrievalEval ------------------------------------------------------

  test("retrievalEval: label-based precision@k and reciprocal rank") {
    val sp = spark
    import sp.implicits._
    // query 0 (label 1): neighbors by distance are 1 (label 1), 2 (label 0),
    // 3 (label 1) -> at k=3: n_rel=2, p@3=2/3, first rel rank 1, rr=1.0
    // query 9 has no same-label doc in range -> n_rel=0, rr=0.0
    val corpus = Seq(
      (0L, Seq(1f, 0f), 1),
      (1L, Seq(1f, 0.1f), 1),
      (2L, Seq(1f, 0.2f), 0),
      (3L, Seq(1f, 0.3f), 1),
      (9L, Seq(-1f, 0f), 7)).toDF("vec_id", "embedding", "label")
    val queries = corpus.where(col("vec_id").isin(0L, 9L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = SimilarityJoin.retrievalEval(corpus, "vec_id", "embedding",
        "label", queries, "qid", "qvec", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), Option(r.get(3)), r.getDouble(4)))).toMap
    assert(got(0L) == ((2L, 2.0 / 3.0, Some(1L), 1.0)), got(0L))
    assert(got(9L) == ((0L, 0.0, None, 0.0)), got(9L))
  }
}
