package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** SemDeDup-style semantic dedup (Dedup.semanticDedup): k-means clusters,
  * per-cluster centroid-distance ordering, earlier-member cosine screen.
  * Planted near-identical vectors collapse to one survivor per clique;
  * singletons survive untouched; the pipeline is deterministic.
  */
class SemanticDedupSpec extends SparkTestBase {

  // three groups in 4-d: A = {0, 1, 5} along e1 (1 and 5 near-copies of 0),
  // B = {2, 3} along e2, C = {4} along e3 (singleton). stride=2 seeds
  // centroids from ids 0, 2, 4 — one per group.
  private def emb = {
    val sp = spark
    import sp.implicits._
    Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.998, 0.01, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.01, 0.998, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0)),
      (5L, Seq(0.999, 0.0, 0.01, 0.0))
    ).toDF("vec_id", "embedding")
  }

  test("one survivor per near-dup clique; singletons untouched; every row labeled") {
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding",
        stride = 2, iters = 2, eps = 0.1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toMap
    assert(got.size == 6, s"every input row must come back labeled: $got")
    // group A: exactly one survivor (the rank-1 member), two dups
    val aFlags = Seq(0L, 1L, 5L).map(got(_)._3)
    assert(aFlags.count(!_) == 1, s"group A should keep exactly one: $got")
    // the kept member of A is its rank-1 (closest to centroid)
    val aKept = Seq(0L, 1L, 5L).filter(!got(_)._3)
    assert(got(aKept.head)._2 == 1L, s"survivor must be rank 1: $got")
    // group B collapses to one survivor too
    assert(Seq(2L, 3L).map(got(_)._3).count(!_) == 1, s"group B: $got")
    // the singleton is never a duplicate
    assert(!got(4L)._3, s"singleton flagged: $got")
    // members of different groups never screen each other: with eps = 0.1
    // nothing across groups is close, so exactly 3 survivors total
    assert(got.values.count(!_._3) == 3, s"3 survivors expected: $got")
  }

  test("deterministic: two runs produce identical rows") {
    def run() = Dedup.semanticDedup(emb, "vec_id", "embedding",
        stride = 2, iters = 2, eps = 0.1)
      .orderBy("vec_id").collect().toSeq
    assert(run() == run())
  }

  test("eps = 0 flags nothing (only exact-identical directions screen)") {
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding",
        stride = 2, iters = 1, eps = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got.values.count(identity) == 0, s"nothing is bit-identical: $got")
  }

  test("empty input yields an empty labeled frame") {
    val sp = spark
    import sp.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(empty, "vec_id", "embedding", stride = 2)
    assert(got.count() == 0)
    assert(got.columns.toSeq ==
      Seq("vec_id", "centroid", "rnk", "cdist", "is_dup"))
  }
}
