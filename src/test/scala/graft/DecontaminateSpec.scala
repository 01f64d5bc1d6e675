package graft

import org.apache.spark.sql.functions._

import graft.ops.Decontaminate

/** Benchmark decontamination: exact n-gram containment against a broadcast
  * benchmark set.
  */
class DecontaminateSpec extends SparkTestBase {

  private def df(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  private val bench = df(
    900L -> "what is the capital of france paris obviously",
    901L -> "compute the sum of the first hundred integers")

  test("docs quoting a benchmark n-gram are flagged with hit counts; clean docs are not") {
    val corpus = df(
      1L -> "the quiz asked what is the capital of france and more", // quotes bench 900
      2L -> "totally unrelated prose about spark shuffles and joins",
      3L -> "compute the sum of the first hundred integers is a classic") // quotes bench 901
    val flagged = Decontaminate.contaminatedIds(
        corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 3L))
    assert(flagged.values.forall(_ >= 1L))
    val clean = Decontaminate.decontaminate(
        corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L))
  }

  test("containment is exact: a 2-gram overlap does not trip a 3-gram check") {
    val corpus = df(4L -> "capital of berlin and nothing else shared here")
    val flagged = Decontaminate.contaminatedIds(
      corpus, "doc_id", col("text"), bench, col("text"), n = 3)
    assert(flagged.count() == 0)
  }

  test("the benchmark side is broadcast (corpus never shuffles for the probe)") {
    val corpus = df((1L to 50L).map(i => i -> s"document number $i with words"): _*)
    val plan = Decontaminate.contaminatedIds(
        corpus, "doc_id", col("text"), bench, col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
