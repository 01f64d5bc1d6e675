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

  test("fuzzy tier: a paraphrased eval doc is flagged by jaccard, survivors stay") {
    // doc 1 shares most 3-grams with bench 900 (one word appended);
    // doc 2 is unrelated; doc 3 shares exactly one 3-gram (containment
    // would flag it, similarity at tau=0.5 must NOT)
    val corpus = df(
      1L -> "what is the capital of france paris obviously indeed",
      2L -> "totally unrelated prose about spark shuffles and joins",
      3L -> "what is the capital question unlike anything else written here today")
    val flagged = Decontaminate.fuzzyContaminatedIds(
        corpus, "doc_id", col("text"), bench, "doc_id", col("text"),
        n = 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flagged.map(_._1).toSet == Set(1L), flagged.mkString(","))
    val (_, nMatches, maxJ) = flagged.head
    assert(nMatches == 1L && maxJ >= 0.5 && maxJ < 1.0)
    // local replay of the jaccard for the flagged pair
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (a, b) = (grams("what is the capital of france paris obviously indeed"),
      grams("what is the capital of france paris obviously"))
    val expected = a.intersect(b).size.toDouble / a.union(b).size
    assert(math.abs(maxJ - expected) < 1e-12)
    val clean = Decontaminate.fuzzyDecontaminate(
        corpus, "doc_id", col("text"), bench, "doc_id", col("text"),
        n = 3, tau = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L))
  }

  test("fuzzy tier broadcasts the benchmark postings side") {
    val corpus = df((1L to 50L).map(i =>
      i -> s"document number $i with some words repeated $i times"): _*)
    val plan = Decontaminate.fuzzyContaminatedIds(
        corpus, "doc_id", col("text"), bench, "doc_id", col("text"),
        n = 3, tau = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
