package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.search.{HashingEmbedder, VectorSearchClient}

/** Physical-plan shape assertions (VERDICT round-1 item 4): the scale
  * guarantees must be visible in the executed plan, not just claimed.
  */
class PlanSpec extends SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def qvec: Array[Double] =
    emb.orderBy("vec_id").select("embedding").head().getSeq[Float](0)
      .map(_.toDouble).toArray

  test("top-k by distance plans as TakeOrderedAndProject (no global sort)") {
    val plan = emb
      .select(col("vec_id"),
        array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id").asc)
      .limit(10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("search back-join broadcasts the k-row side (no corpus shuffle)") {
    val client = VectorSearchClient.fromEmbedded(
      docs.select("doc_id", "text"),
      emb.withColumnRenamed("vec_id", "doc_id"),
      "doc_id", HashingEmbedder(64))
    val plan = client.searchByVector(qvec, 10).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("distance expression runs inside WholeStageCodegen over a parquet scan") {
    val df = emb.select(
      array_cosine_distance(col("embedding"), typedLit(qvec.toSeq)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefix marks codegen stages; the Project carrying the distance
    // must be inside one.
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")), plan)
  }

  test("parquet scan prunes columns for narrow projections") {
    val df = docs.select("doc_id")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint>"), scan)
  }

  test("filter pushdown reaches the parquet scan") {
    val df = docs.where(col("lang") === "en").select("doc_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
  }
}
