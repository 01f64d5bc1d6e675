package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — Spark's native row-level runtime
  * filter for selective fact↔dim shuffle joins (the 100 TB shape: a
  * selective dim predicate becomes a bloom filter evaluated INSIDE the fact
  * scan stage, so non-matching fact rows die before the shuffle instead of
  * after it). Local thresholds are tuned for big clusters, so the spec
  * lowers them to force injection and proves (a) the filter lands in the
  * plan and (b) results are identical with and without it.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val Sf = "/root/testdata/sf0.01"

  private def joined = {
    val lineitem = spark.read.parquet(s"$Sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
  }

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim side injects bloom_filter_might_contain into the fact scan") {
    val baseline = joined.collect().toSeq // broadcast path, default confs

    withConfs(
      // force a shuffle join (broadcast joins don't need the runtime filter)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // cluster-sized gates, lowered so sf0.01 qualifies
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val df = joined
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // semantics unchanged: the bloom filter only removes rows the join
      // would drop anyway
      assert(df.collect().toSeq == baseline)
    }
  }

  test("no injection when the feature is disabled") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"), optimized)
    }
  }
}
