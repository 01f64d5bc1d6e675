package graft

/** End-to-end curation funnel: stage counts must start at the corpus size
  * and shrink monotonically (each stage only filters). Value-exactness vs
  * DuckDB is the oracle gate's job; this spec pins the structural contract.
  */
class CurationFunnelSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("six stages, monotonically non-increasing, starting at corpus size") {
    val rows = SparkEntry.queries("curation_funnel")(spark, dir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 6)
    assert(rows.map(_.getString(1)).toSeq == Seq(
      "all", "min_length", "quality", "not_repetitive", "exact_dedup", "near_dedup"))
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts.head ==
      spark.read.parquet(s"$dir/documents.parquet").count())
    assert(counts.sliding(2).forall(p => p(1) <= p(0)), counts.toString)
    assert(counts.last > 0)
  }

  test("funnel is deterministic across runs") {
    val a = SparkEntry.queries("curation_funnel")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("curation_funnel")(spark, dir).collect().toSeq
    assert(a == b)
  }
}
