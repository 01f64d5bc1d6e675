package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions._

import graft.functions._

/** ScalaCheck properties for the distance expressions (SURVEY §5.2.3).
  * Cases are batched into one DataFrame per property evaluation so the real
  * (non-const-folded) expression path runs.
  */
object VectorPropertiesSpec extends Properties("graft.vector") {
  private def spark = SparkTestBase.spark
  import Prop.forAll

  private val vecGen: Gen[Seq[Double]] =
    Gen.chooseNum(2, 16).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)).map(_.toSeq)
    }

  private def evalPairs(pairs: Seq[(Seq[Double], Seq[Double])]): Seq[Double] = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("a", "b")
      .select(array_cosine_distance(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
  }

  property("cos_dist(a, a) ~= 0 for nonzero vectors") =
    forAll(Gen.listOfN(8, vecGen)) { vs =>
      val nonzero = vs.filter(_.exists(_ != 0.0))
      // sqrt(x)*sqrt(x) != x at ULP level: self-distance is within 1e-12 of 0
      nonzero.isEmpty ||
        evalPairs(nonzero.map(v => (v, v))).forall(d => d >= 0.0 && d <= 1e-12)
    }

  property("cos_dist symmetric") =
    forAll(Gen.listOfN(6, Gen.zip(vecGen, vecGen))) { ps =>
      val sameDim = ps.filter { case (a, b) => a.length == b.length }
      sameDim.isEmpty || evalPairs(sameDim) == evalPairs(sameDim.map(_.swap))
    }

  property("cos_dist range [0, 2]") =
    forAll(Gen.listOfN(6, Gen.zip(vecGen, vecGen))) { ps =>
      val sameDim = ps.filter { case (a, b) => a.length == b.length }
      sameDim.isEmpty || evalPairs(sameDim).forall(d => d >= 0.0 && d <= 2.0)
    }
}

/** topk == sort.take(n), stable under repartitioning (deterministic — plain
  * suite, not a random property).
  */
class TopKStabilitySpec extends SparkTestBase {

  test("topk(n) == full sort take n, stable under repartition") {
    val sp = spark
    import sp.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.orderBy("vec_id").select("embedding").as[Array[Float]].head()
      .map(_.toDouble).toSeq
    def scored(parts: Int) = emb.repartition(parts)
      .select(col("vec_id"), array_cosine_distance(col("embedding"), typedLit(q)).as("d"))
    val full = scored(4).orderBy(col("d").asc_nulls_last, col("vec_id").asc)
      .collect().take(10).map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (parts <- Seq(1, 3, 7)) {
      val topk = scored(parts).orderBy(col("d").asc_nulls_last, col("vec_id").asc)
        .limit(10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(topk == full, s"parts=$parts")
    }
  }
}
