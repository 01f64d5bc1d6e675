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
}
