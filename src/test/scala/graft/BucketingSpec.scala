package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: co-located joins without a shuffle. Both sides are written
  * `bucketBy` the join key; the join plan must contain no Exchange on the
  * bucketed sides — the physical property a 100 TB fact-fact join depends
  * on (shuffle of the big side is the cost that bucketing deletes).
  */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables plans without exchanges") {
    // external tables via explicit paths (warehouse dir is a static conf);
    // disable auto-broadcast so the join exercises the bucketed SMJ path a
    // 100 TB fact-fact join would take (broadcast is the small-data cheat)
    val wh = Files.createTempDirectory("graft_warehouse").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not shuffle either side (bucket co-location);
    // the only exchange allowed is the one feeding the final aggregation
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      plan)
    assert(!joinSection.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // and the result matches the unbucketed join
    val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
