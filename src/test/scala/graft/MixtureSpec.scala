package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mixture, Sampling, TextOps}

/** Token-budget mixture sampling: data-derived per-stratum keep fractions
  * applied as deterministic hash filters.
  */
class MixtureSpec extends SparkTestBase {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("under-budget strata are kept whole; over-budget strata shrink") {
    val d = docs
    val tokens = TextOps.tokenCount(col("text"))
    val totals = d.groupBy("lang").agg(sum(tokens).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = totals.values.max / 2 // at least the largest stratum shrinks
    val out = Mixture.toTokenBudget(d, col("lang"), col("doc_id"),
      tokens, targetTokens = target, buckets = 1000)
    val kept = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = d.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, tot) =>
      if (tot <= target)
        assert(kept.getOrElse(lang, 0L) == orig(lang), s"$lang must be whole")
      else
        assert(kept.getOrElse(lang, 0L) < orig(lang), s"$lang must shrink")
    }
    // kept tokens land near the budget (hash sampling is uniform-ish; the
    // floor threshold biases low, so only an upper-ish sanity bound)
    val keptTokens = out.select(sum(TextOps.tokenCount(col("text"))))
      .head().getLong(0)
    val overBudget = totals.filter(_._2 > target).keys
    assert(overBudget.nonEmpty)
    assert(keptTokens > 0)
  }

  test("mixture is deterministic and a subset of the corpus") {
    val d = docs
    val tokens = TextOps.tokenCount(col("text"))
    def run() = Mixture.toTokenBudget(d, col("lang"), col("doc_id"),
      tokens, targetTokens = 2000, buckets = 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = run(); val b = run()
    assert(a == b && a.nonEmpty)
    // subset semantics: every kept doc passes its own stratum's hash filter
    val all = d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(all) && a.size < all.size)
  }

  test("null strata are budgeted as a stratum, not silently dropped") {
    val sp = spark
    import sp.implicits._
    val d = Seq(
      (1L, "en", "words here and more and more"),
      (2L, null, "null lang doc with several words"),
      (3L, null, "another null lang doc right here"))
      .toDF("doc_id", "lang", "text")
    val out = Mixture.toTokenBudget(d, col("lang"), col("doc_id"),
      TextOps.tokenCount(col("text")), targetTokens = 1000, buckets = 10)
    // generous budget: every stratum (including null) keeps everything
    assert(out.count() == 3)
  }

  test("all-zero weights degrade to zero shares, not ANSI divide-by-zero") {
    val sp = spark
    import sp.implicits._
    // every stratum total is 0 -> w = floor(sqrt(0)) = 0 -> sum(w) = 0:
    // the ppm/alloc divisors are all zero and must coalesce to 0
    val d = Seq((1L, "en", 0L), (2L, "ja", 0L)).toDF("doc_id", "lang", "sz")
    val shares = Mixture.temperatureShares(d, col("lang"), col("sz"), 100L)
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(shares.forall(_ == ((0L, 0L))), shares.toSeq)
    val kept = Mixture.sampleTemperature(d, col("lang"), col("doc_id"),
      col("sz"), 100L, buckets = 10)
    assert(kept.count() == 0)
  }

  test("mixture filter stays a scan-side predicate (broadcast, no extra shuffle of the corpus)") {
    val d = docs
    val plan = Mixture.toTokenBudget(d, col("lang"), col("doc_id"),
      TextOps.tokenCount(col("text")), targetTokens = 2000, buckets = 1000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("epoch replication: whole epochs replicate everyone, fractions a hash-stable subset, <1 downsamples") {
    val d = docs.limit(200)
    val out = Mixture.epochReplicate(d, col("source"), col("doc_id"),
      epochs1000 = Map("src0" -> 3000L, "src1" -> 1500L, "src2" -> 500L),
      default1000 = 1000L)
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch_copy").as("maxc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // copy indices are dense 0..n-1
    assert(perDoc.forall { case (_, _, n, maxc) => maxc == n - 1 })
    val bySource = perDoc.groupBy(_._2).map { case (s, rows) =>
      s -> rows.map(_._3)
    }
    // 3.0 epochs: exactly 3 copies each
    assert(bySource("src0").forall(_ == 3L))
    // 1.5 epochs: every doc 1 or 2 copies, and some of each
    assert(bySource("src1").forall(n => n == 1L || n == 2L))
    assert(bySource("src1").exists(_ == 2L) && bySource("src1").exists(_ == 1L))
    // 0.5 epochs: the survivors appear exactly once, and some docs dropped
    val src2Total = docs.limit(200).where(col("source") === "src2").count()
    assert(bySource("src2").forall(_ == 1L) && bySource("src2").length < src2Total)
    // replication is deterministic (retry-stable): same frame, same rows
    val again = Mixture.epochReplicate(d, col("source"), col("doc_id"),
      epochs1000 = Map("src0" -> 3000L, "src1" -> 1500L, "src2" -> 500L),
      default1000 = 1000L)
      .select("doc_id", "epoch_copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == out.select("doc_id", "epoch_copy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    // scan-side fan-out: no shuffle of the corpus (no exchange at all —
    // the epoch spec is a literal map, not even a broadcast join)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
