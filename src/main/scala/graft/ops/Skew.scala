package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB scale.
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; these
  * helpers cover the two cases it does not:
  *  - a single hot GROUP BY key overwhelming one reducer (`saltedAgg`),
  *  - a broadcast-infeasible join against a dimension with hot keys
  *    (`saltedJoin`).
  *
  * Salting is deterministic (xxhash64 of caller-chosen columns, mod the salt
  * count) so results are reproducible run-to-run — no `rand()`, which would
  * break retries and speculative execution (a retried task must salt rows
  * identically or rows double-count).
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: phase one
    * aggregates on (key, salt) — spreading a hot key over `salts` reducers —
    * phase two merges the partials per key. `aggs` maps output column name
    * to (phase-1 aggregate of the input column, phase-2 merge of the
    * phase-1 result); sums/counts/min/max compose this way.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBy: Seq[Column],
      salts: Int, aggs: Map[String, (Column => Column, Column => Column)]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn("__salt", pmod(xxhash64(saltBy: _*), lit(salts.toLong)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        aggs.head match { case (name, (p1, _)) => p1(col(name)).as(s"__p_$name") },
        aggs.tail.map { case (name, (p1, _)) => p1(col(name)).as(s"__p_$name") }.toSeq: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        aggs.head match { case (name, (_, p2)) => p2(col(s"__p_$name")).as(name) },
        aggs.tail.map { case (name, (_, p2)) => p2(col(s"__p_$name")).as(name) }.toSeq: _*)
  }

  /** Convenience: salted sum + count per key (the common rollup shape). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltBy: Seq[Column], salts: Int = 16): DataFrame =
    saltedAgg(df, keyCols, saltBy, salts, Map(
      valueCol -> (c => sum(c), c => sum(c)),
      "__cnt" -> (_ => count(lit(1)), c => sum(c))))
      .withColumnRenamed(valueCol, s"sum_$valueCol")
      .withColumnRenamed("__cnt", "n_rows")

  /** Skew-safe equi-join: the facts side gets a deterministic salt in
    * [0, salts), the dimension side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key's rows spread over `salts`
    * tasks instead of one. Dimension replication costs |dim| * salts rows;
    * use only when the dimension is modest but too hot/big to broadcast.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltBy: Seq[Column], salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFacts = facts
      .withColumn("__salt", pmod(xxhash64(saltBy: _*), lit(salts.toLong)))
    val repl = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    saltedFacts.join(repl, Seq(key, "__salt")).drop("__salt")
  }
}
