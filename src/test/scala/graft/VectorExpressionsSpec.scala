package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.functions._

/** F1/F2 edge semantics pinned to the DuckDB 1.0 oracle (FIXTURES.md §C):
  * parallel -> 0, orthogonal -> 1, opposite -> 2, zero vector -> 2.0
  * (similarity -1.0), NULL -> NULL, dim mismatch -> error, similarity
  * clamped to [-1, 1].
  */
class VectorExpressionsSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def dist(a: Seq[Double], b: Seq[Double]): java.lang.Double =
    Seq((a, b)).toDF("a", "b")
      .select(array_cosine_distance(col("a"), col("b")))
      .head().get(0).asInstanceOf[java.lang.Double]

  test("parallel vectors have distance 0") {
    assert(dist(Seq(1.0, 0.0), Seq(2.0, 0.0)) == 0.0)
  }

  test("orthogonal vectors have distance 1") {
    assert(dist(Seq(1.0, 0.0), Seq(0.0, 3.0)) == 1.0)
  }

  test("opposite vectors have distance 2") {
    assert(dist(Seq(1.0, 0.0), Seq(-1.0, 0.0)) == 2.0)
  }

  test("zero vector distance is 2.0 (DuckDB 1.0 similarity -1.0)") {
    assert(dist(Seq(0.0, 0.0), Seq(1.0, 2.0)) == 2.0)
  }

  test("NULL input yields NULL") {
    val r = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(array_cosine_distance(col("a"), col("b")))
      .head()
    assert(r.isNullAt(0))
  }

  test("NULL element yields NULL") {
    val df = spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(1.0D, 2.0D) AS b")
    graft.functions.registerAll(spark)
    assert(df.select(array_cosine_distance(col("a"), col("b"))).head().isNullAt(0))
  }

  test("dimension mismatch throws with DuckDB cast-error parity text") {
    val e = intercept[Exception] {
      Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
        .select(array_cosine_distance(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("length 3 to array with length 2")))
  }

  test("similarity is clamped to [-1, 1] (self-similarity exactly 1)") {
    // range-based input: not a local relation, so codegen actually runs
    val df = spark.range(100)
      .select(transform(sequence(lit(0), lit(63)),
        i => (col("id") + i + 1).cast("double")).as("v"))
    val sims = df.select(array_cosine_similarity(col("v"), col("v"))).collect()
    // never exceeds 1 (clamped); may undershoot by an ULP (sqrt(x)^2 != x)
    assert(sims.forall(r => r.getDouble(0) <= 1.0 && r.getDouble(0) >= 1.0 - 1e-12))
  }

  test("float32 arrays widen to double (mixed float/double inputs)") {
    val d = Seq((Seq(1.0f, 0.0f), Seq(1.0, 0.0))).toDF("a", "b")
      .select(array_cosine_distance(col("a"), col("b"))).head().getDouble(0)
    assert(d == 0.0)
  }

  test("SQL registry exposes all functions") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT array_cosine_distance(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS d,
        |       array_inner_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |       array_distance(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |       array_l2_norm(array(3.0D, 4.0D)) AS n,
        |       simhash(array('a', 'b')) AS sh""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) == 5.0)
    assert(!r.isNullAt(4))
  }

  test("cosine_argmin: distance semantics, tie to lowest cid, error paths") {
    graft.functions.registerAll(spark)
    // candidate 20 is parallel (d=0), 10 orthogonal (d=1) -> 20 wins
    val r = spark.sql(
      """SELECT cosine_argmin(array(1.0D, 0.0D),
        |         array(10L, 20L),
        |         array(array(0.0D, 1.0D), array(2.0D, 0.0D))) AS best,
        |       cosine_argmin(array(1.0D, 0.0D),
        |         array(9L, 3L),
        |         array(array(1.0D, 0.0D), array(3.0D, 0.0D))) AS tie,
        |       cosine_argmin(array(1.0D, 0.0D),
        |         array(7L),
        |         array(array(0.0D, 0.0D))) AS zerovec,
        |       cosine_argmin(array(1.0D, 0.0D),
        |         cast(array() AS array<bigint>),
        |         cast(array() AS array<array<double>>)) AS empty""".stripMargin).head()
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 3L, "equal distances must tie to the lowest cid")
    assert(r.getLong(2) == 7L, "zero-vector candidate (d=2.0) still selectable")
    assert(r.isNullAt(3), "no candidates -> NULL")
    // agrees with the two-expression formulation on real float data, and
    // runs through codegen (parquet scan, not a folded LocalRelation)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.where(col("vec_id") % 64 === 0)
    val candArr = cents.agg(
      collect_list(col("vec_id").cast("long")).as("cids"),
      collect_list(col("embedding")).as("cvecs"))
    val got = emb.limit(50).crossJoin(candArr)
      .select(col("vec_id"),
        cosine_argmin(col("embedding"), col("cids"), col("cvecs")).as("best"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val centRows = cents.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(row => row.getLong(0) -> row.getSeq[Float](1))
    val expect = emb.limit(50)
      .select(col("vec_id").cast("long"), col("embedding")).collect().map { row =>
        val v = row.getSeq[Float](1)
        def d(c: Seq[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0
          v.indices.foreach { i =>
            val x = v(i).toDouble; val y = c(i).toDouble
            dot += x * y; na += x * x; nb += y * y
          }
          if (na == 0.0 || nb == 0.0) 2.0
          else 1.0 - math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
        }
        row.getLong(0) -> centRows.map { case (cid, cv) => (d(cv), cid) }.min._2
      }.toMap
    assert(got == expect, "codegen'd argmin diverged from the replay")
    val err = intercept[Exception] {
      spark.sql("""SELECT cosine_argmin(array(1.0D, 0.0D), array(1L),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D)))""".stripMargin).head()
    }
    assert(err.getMessage.contains("cosine_argmin") ||
      err.getCause != null && err.getCause.getMessage.contains("cosine_argmin"))
  }

  test("simhash: equal token arrays agree, empty array is 0, null is null") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT simhash(array('x','y','z')) AS a, simhash(array('x','y','z')) AS b,
        |       simhash(CAST(array() AS ARRAY<STRING>)) AS e,
        |       simhash(CAST(NULL AS ARRAY<STRING>)) AS n""".stripMargin)
      .head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3))
  }
}
