package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data step that removes corpus
  * documents overlapping an evaluation/benchmark set, so the model is not
  * trained on its own test data. Standard practice is exact n-gram
  * containment (stricter than near-dup similarity: ONE shared n-gram above
  * the chosen length is contamination, whatever the rest of the document
  * looks like).
  *
  * Scale shape: the benchmark n-gram set is vocabulary-sized (benchmarks
  * are small — thousands of documents, not billions), so it is distinct'd
  * and BROADCAST; the corpus side explodes its n-grams and left-semi-joins
  * the broadcast set — one corpus scan, no corpus shuffle. The corpus is
  * never joined to itself, and the contaminated-id set that comes back is
  * tiny (it is bounded by the corpus rows that actually overlap).
  */
object Decontaminate {

  /** Distinct benchmark n-grams (the broadcast side). */
  def benchmarkNGrams(benchmark: DataFrame, textCol: Column, n: Int): DataFrame =
    benchmark.select(explode(TextOps.wordNGrams(textCol, n)).as("__gram"))
      .distinct()

  /** Corpus doc ids sharing at least one n-gram with the benchmark —
    * (idCol, n_hits) where n_hits counts the doc's DISTINCT contaminated
    * n-grams (evidence strength, useful for review queues).
    */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: Column,
      benchmark: DataFrame, benchTextCol: Column, n: Int): DataFrame = {
    val grams = benchmarkNGrams(benchmark, benchTextCol, n)
    corpus
      .select(col(idCol), explode(array_distinct(TextOps.wordNGrams(textCol, n))).as("__gram"))
      .join(broadcast(grams), "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The clean corpus: rows with zero benchmark n-gram overlap. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: Column,
      benchmark: DataFrame, benchTextCol: Column, n: Int): DataFrame =
    corpus.join(
      contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, n)
        .select(idCol),
      Seq(idCol), "left_anti")

  /** FUZZY contamination: corpus docs whose n-gram Jaccard similarity vs
    * ANY benchmark doc reaches `tau` — the near-duplicate decontamination
    * tier (GPT-3-style fuzzy eval-overlap removal: a test item paraphrased
    * or lightly edited into a training page shares most of its n-grams
    * without necessarily sharing a long exact one, so the containment tier
    * above under-flags and a similarity tier is run alongside it).
    *
    * Output: (idCol, n_bench_matches: long, max_jaccard: double) for
    * flagged corpus docs only. max_jaccard is one IEEE division per pair
    * then a max — order-free, bit-exact cross-engine.
    *
    * Scale shape: the corpus side explodes its distinct shingles ONCE; the
    * benchmark postings (benchmark-sized, i.e. small) are explicitly
    * BROADCAST into the shingle equi-join, so the corpus never shuffles on
    * shingle and is never self-joined; the per-pair aggregate then keys on
    * (corpus doc, bench doc) — bounded by the docs that actually share
    * shingles. The [[Dedup.jaccardJoin]] size prefilter applies before the
    * aggregate. Hot boilerplate shingles in the BENCHMARK would fan out the
    * broadcast join; compose [[Dedup.dropHotShingles]] over the shingled
    * sides first if your benchmark has any.
    */
  def fuzzyContaminatedIds(corpus: DataFrame, idCol: String, textCol: Column,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: Column,
      n: Int, tau: Double): DataFrame = {
    val c = corpus.select(col(idCol), TextOps.wordNGrams(textCol, n).as("__sh"))
    val b = benchmark.select(col(benchIdCol).as("__bid"),
      TextOps.wordNGrams(benchTextCol, n).as("__sh"))
    Dedup.againstCore(
        Dedup.explodedPostings(c, idCol, "__sh", "a", "size_a"),
        broadcast(Dedup.explodedPostings(b, "__bid", "__sh", "b", "size_b")),
        tau)
      .groupBy(col("a").as(idCol))
      .agg(count(lit(1)).as("n_bench_matches"),
        max(col("jaccard")).as("max_jaccard"))
  }

  /** The fuzzy-clean corpus: rows below `tau` Jaccard vs every benchmark
    * doc. Run IN ADDITION to [[decontaminate]], not instead of it — the two
    * tiers flag different overlap shapes.
    */
  def fuzzyDecontaminate(corpus: DataFrame, idCol: String, textCol: Column,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: Column,
      n: Int, tau: Double): DataFrame =
    corpus.join(
      fuzzyContaminatedIds(corpus, idCol, textCol, benchmark, benchIdCol,
        benchTextCol, n, tau).select(idCol),
      Seq(idCol), "left_anti")
}
