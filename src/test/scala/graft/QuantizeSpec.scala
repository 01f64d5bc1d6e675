package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantize

/** int8 quantization: code range, degenerate inputs, ranking quality vs
  * exact cosine, and dot-product reconstruction error.
  */
class QuantizeSpec extends SparkTestBase {
  private val sp = SparkTestBase.spark
  import sp.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("codes stay in [-127, 127]; zero vector gives null distance") {
    val rows = emb.select(Quantize.codes(col("e")).as("q"))
      .select(array_max(col("q")).as("mx"), array_min(col("q")).as("mn"))
      .agg(max("mx"), min("mn")).head()
    assert(rows.getInt(0) <= 127 && rows.getInt(1) >= -127)
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Quantize.cosineDistance(
        Quantize.codes(col("a")), Quantize.codes(col("b"))).as("d"))
      .head()
    assert(z.isNullAt(0))
  }

  test("native Int8Codes == the higher-order-function formulation, and codesLocal") {
    // the HOF encoding it replaced (kept here as the semantic reference)
    val mx = array_max(transform(col("e"), v => abs(v)))
    val s = when(mx > 0, lit(127.0) / mx).otherwise(lit(1.0))
    val hof = transform(col("e"), v => round(v * s).cast("int"))
    val rows = emb
      .select(col("vec_id"), Quantize.codes(col("e")).as("q"), hof.as("ref"), col("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getSeq[Int](1); val ref = r.getSeq[Int](2)
      assert(q == ref, s"vec ${r.getLong(0)}")
      // driver-side twin used for literal query codes
      assert(Quantize.codesLocal(r.getSeq[Double](3).toArray).map(_.get) == ref,
        s"codesLocal vec ${r.getLong(0)}")
    }
    // degenerate inputs: all-zero and negative-heavy vectors
    val edge = Seq(Seq(0.0, 0.0, 0.0), Seq(-2.0, 1.0, -0.5), Seq(-2.5, 5.0))
      .toDF("v").select(Quantize.codes(col("v")).as("q"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(edge(0) == Seq(0, 0, 0))
    assert(edge(1) == Seq(-127, 64, -32)) // round(63.5) = 64 half-away
    assert(edge(2) == Seq(-64, 127))      // round(-63.5) = -64 half-away
  }

  test("non-finite elements code to null, excluded from the scale (both paths)") {
    val vec = Array(Double.NaN, 2.0, Double.PositiveInfinity, -1.0,
      Double.NegativeInfinity)
    val engine = Seq(Tuple1(vec.toSeq)).toDF("v")
      .select(Quantize.codes(col("v")).as("q"))
      .head().getSeq[Any](0)
    // scale comes from max|finite| = 2.0 → codes 127 and -64; non-finite → null
    assert(engine == Seq(null, 127, null, -64, null))
    assert(Quantize.codesLocal(vec) ==
      Seq(None, Some(127), None, Some(-64), None))
  }

  test("quantized top-10 recalls >= 8 of the exact cosine top-10") {
    val qvec = emb.where(col("vec_id") === 7).select("e").head().getSeq[Double](0)
    val exact = emb.select(col("vec_id"),
        graft.functions.array_cosine_distance(col("e"), typedLit(qvec)).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val codes = emb.select(col("vec_id"), Quantize.codes(col("e")).as("q"))
    val qq = codes.where(col("vec_id") === 7).select(col("q").as("qq"))
    val quant = codes.crossJoin(broadcast(qq))
      .select(col("vec_id"), Quantize.cosineDistance(col("q"), col("qq")).as("d"))
      .orderBy(col("d").asc_nulls_last, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(quant).size
    assert(recall >= 8, s"recall@10 = $recall (exact=$exact quant=$quant)")
  }

  test("quantized distance projects inside whole-stage codegen") {
    val codes = emb.select(col("vec_id"), Quantize.codes(col("e")).as("q"))
    val qq = codes.where(col("vec_id") === 7).select(col("q").as("qq"))
    val df = codes.crossJoin(broadcast(qq))
      .select(Quantize.cosineDistance(col("q"), col("qq")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val codegenProject = plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.stripPrefix("+- ").startsWith("*("))
    assert(codegenProject, s"distance projection not codegen'd:\n$plan")
  }

  test("reconstructed dot error is bounded by 2% of the norm product") {
    // int8 error is per-element additive: |err| scales with |a||b|, not with
    // the dot value itself (near-orthogonal pairs cancel to small dots)
    val q = emb.select(col("vec_id"), col("e"),
      Quantize.codes(col("e")).as("qc"), Quantize.scaleOf(col("e")).as("s"))
    val qv = q.where(col("vec_id") === 3)
      .select(col("qc").as("qb"), col("s").as("sb"), col("e").as("eb"))
    val rows = q.where(col("vec_id") < 50).crossJoin(broadcast(qv))
      .select(
        graft.functions.array_inner_product(col("e"), col("eb")).as("exact"),
        (graft.functions.array_l2_norm(col("e")) *
          graft.functions.array_l2_norm(col("eb"))).as("norms"),
        Quantize.dotReconstructed(col("qc"), col("s"), col("qb"), col("sb")).as("approx"))
      .collect()
    rows.foreach { r =>
      val (exact, norms, approx) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(exact - approx) <= 0.02 * norms,
        s"dot $exact vs reconstructed $approx (norms $norms)")
    }
  }
}
