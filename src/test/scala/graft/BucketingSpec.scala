package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located join on bucketed tables: matching bucket counts on the join
  * key must satisfy the join's distribution requirement, so the sort-merge
  * join plans with ZERO Exchange — the whole point of paying the bucketed
  * layout at ingest.
  */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("merge join of co-bucketed tables has no Exchange and exact results") {
    val sp = spark
    val o = sp.read.parquet(s"$dir/orders.parquet")
    val l = sp.read.parquet(s"$dir/lineitem.parquet")
    Bucketing.writeBucketed(o, "bkt_spec_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(l, "bkt_spec_lineitem", "l_orderkey", 4)
    try {
      val joined = sp.table("bkt_spec_lineitem").hint("merge")
        .join(sp.table("bkt_spec_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // same join WITHOUT bucketing must shuffle (sanity: the assertion
      // above is meaningful, not vacuous)
      val unbucketed = l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
      // layout changes the plan, never the answer
      val a = joined.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      val b = unbucketed.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(a == b && a.nonEmpty)
    } finally {
      Bucketing.drop(sp, "bkt_spec_orders")
      Bucketing.drop(sp, "bkt_spec_lineitem")
    }
  }
}
