package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Sequence packing: the distributed prefix sum must equal the sequential
  * cumsum for any partition count, including edge rows (zero-token docs,
  * bin-boundary-straddling docs).
  */
class PackingSpec extends SparkTestBase {

  private def docs(ns: Seq[Long]) = {
    val sp = spark
    import sp.implicits._
    ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
  }

  test("distributed prefix sum equals the sequential cumsum at any partition count") {
    val rng = new scala.util.Random(7)
    val ns = Seq.fill(300)(rng.nextInt(900).toLong) ++ Seq(0L, 0L, 1L, 511L, 512L, 513L)
    val d = docs(rng.shuffle(ns))
    val naive = d
      .withColumn("start_offset",
        coalesce(sum(col("n")).over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "start_offset")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(1, 2, 7, 32)) {
      val got = Packing.sequenceOffsets(d, "id", col("n"), 512, partitions = p)
        .select("id", "start_offset")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"partitions = $p")
    }
  }

  test("bin spans: straddlers span bins, exact fits do not, empty docs hold one bin") {
    val d = docs(Seq(512L, 100L, 500L, 0L, 24L))
    val rows = Packing.sequenceOffsets(d, "id", col("n"), 512)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // id 0: [0, 512) -> exactly bin 0. id 1: [512, 612) -> bin 1.
    // id 2: [612, 1112) -> bins 1..2 (straddles). id 3: empty at 1112 -> bin 2.
    // id 4: [1112, 1136) -> bin 2.
    assert(rows.toSeq == Seq(
      (0L, 0L, 0L, 0L), (1L, 512L, 1L, 1L), (2L, 612L, 1L, 2L),
      (3L, 1112L, 2L, 2L), (4L, 1112L, 2L, 2L)))
  }

  test("the corpus-side window is partitioned (no global single-task window over rows)") {
    val d = docs(Seq.fill(50)(10L))
    val plan = Packing.sequenceOffsets(d, "id", col("n"), 512)
      .queryExecution.optimizedPlan.toString
    // the per-row running total must carry the partition key; only the
    // partition-count-sized offset frame may use an unpartitioned window
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.exists(_.contains("__pid")), plan)
  }

  test("packTokens routes every token to a dense gap-free slot; docs cross bins") {
    val sp = spark
    import sp.implicits._
    // docs of 3, 4, 2 tokens; binSize 4 -> stream 0..8 over bins 0,1,2
    val toks = Seq(
      (0L, 0L, 10L), (0L, 1L, 11L), (0L, 2L, 12L),
      (1L, 0L, 20L), (1L, 1L, 21L), (1L, 2L, 22L), (1L, 3L, 23L),
      (2L, 0L, 30L), (2L, 1L, 31L)
    ).toDF("id", "pos", "token_id")
    val offs = Packing.sequenceOffsets(
      Seq((0L, "a b c"), (1L, "d e f g"), (2L, "h i")).toDF("id", "text"),
      "id", size(split(col("text"), " ")), binSize = 4)
    val got = Packing.packTokens(toks, "id", 4, offs)
      .orderBy("seq_id", "pos_in_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, 0L, 10L), (0L, 1L, 11L), (0L, 2L, 12L), (0L, 3L, 20L), // doc 1 starts mid-bin
      (1L, 0L, 21L), (1L, 1L, 22L), (1L, 2L, 23L), (1L, 3L, 30L), // doc 2 crosses too
      (2L, 0L, 31L)))
    // slot coverage is dense and gap-free: global positions 0..8
    val gpos = got.map { case (s, p, _) => s * 4 + p }
    assert(gpos == (0L until 9L))
  }

  test("packTokens covers every global position exactly once (randomized)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 3) {
      val lens = Seq.fill(30)(rnd.nextInt(9).toLong) // includes zero-length
      val docsDf = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
      val toks = lens.zipWithIndex.flatMap { case (n, i) =>
        (0L until n).map(p => (i.toLong, p, rnd.nextInt(100).toLong))
      }.toDF("id", "pos", "token_id")
      val binSize = 1 + rnd.nextInt(7)
      val offs = Packing.sequenceOffsets(docsDf, "id", col("n"), binSize)
      val got = Packing.packTokens(toks, "id", binSize, offs)
        .collect().map(r => r.getLong(0) * binSize + r.getLong(1)).sorted.toSeq
      assert(got == (0L until lens.sum),
        s"trial $trial binSize $binSize: slots not dense")
    }
  }
}
