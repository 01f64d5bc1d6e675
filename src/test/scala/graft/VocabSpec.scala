package graft

import org.apache.spark.sql.functions._

import graft.ops.Vocab

/** Vocabulary induction + encoding: pinned id ordering, OOV handling, the
  * packed form's position-rebuilt ordering, and edge documents.
  */
class VocabSpec extends SparkTestBase {
  private val sp = spark
  import sp.implicits._

  private def corpus = Seq(
    (0L, "b a b c b a"),   // counts: b=3, a=2, c=1
    (1L, "a d"),           // a=1 more, d=1
    (2L, "")               // split("", " ") -> [""] — one empty token
  ).toDF("doc_id", "text")

  test("induce pins ids by (count desc, token asc) and cuts at size") {
    val v = Vocab.induce(corpus, "text", 3)
      .orderBy("token_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // counts: a=3, b=3, ""=1, c=1, d=1 — ties broken token-asc
    assert(v.toSeq == Seq(("a", 0L, 3L), ("b", 1L, 3L), ("", 2L, 1L)))
  }

  test("encode maps through the vocab with OOV fallback, positions 0-based") {
    val v = Vocab.induce(corpus, "text", 3)
    val got = Vocab.encode(corpus, "doc_id", "text", v, oovId = -1L)
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L), (0L, 1L, 0L), (0L, 2L, 1L), (0L, 3L, -1L), // c is OOV
      (0L, 4L, 1L), (0L, 5L, 0L),
      (1L, 0L, 0L), (1L, 1L, -1L),                             // d is OOV
      (2L, 0L, 2L)))                                           // "" in vocab
  }

  test("encodePacked rebuilds token order from positions, one row per doc") {
    val v = Vocab.induce(corpus, "text", 3)
    val got = Vocab.encodePacked(corpus, "doc_id", "text", v)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(got.toSeq == Seq(
      (0L, Seq(1L, 0L, 1L, -1L, 1L, 0L)),
      (1L, Seq(0L, -1L)),
      (2L, Seq(2L))))
  }

  test("induce size larger than distinct token count returns them all") {
    val v = Vocab.induce(corpus, "text", 100).collect()
    assert(v.length == 5)
    assert(v.map(_.getLong(1)).sorted.toSeq == (0L until 5L))
  }

  test("induce matches a driver replay on random corpora (pinned order)") {
    val rnd = new scala.util.Random(424242)
    for (trial <- 1 to 3) {
      val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
      val corpusSeq = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      val df = corpusSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(6)
      val got = Vocab.induce(df, "text", k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
      val counts = corpusSeq.flatMap(_.split(" ", -1))
        .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      val want = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
        .zipWithIndex.map { case ((w, c), i) => (w, i.toLong, c) }
      assert(got.toSeq == want, s"trial $trial k=$k")
    }
  }

  test("top-k cut plans as TakeOrderedAndProject, not a global sort") {
    // scale posture: the count table is never globally sorted
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Vocab.induce(d, "text", 64).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
