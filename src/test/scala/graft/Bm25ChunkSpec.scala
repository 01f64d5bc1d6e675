package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Differential coverage for the two BM25 tiers and the chunkStats
  * projection (round-4 additions that shipped untested).
  */
class Bm25ChunkSpec extends SparkTestBase {

  private def corpus: DataFrame = {
    val sp = spark
    import sp.implicits._
    val vocab = Seq("spark", "join", "fast", "slow", "shuffle", "scan",
      "sort", "hash", "merge", "plan", "code", "gen", "row", "col", "map",
      "agg", "sum", "min", "max", "avg")
    val texts = (0 until 40).map { i =>
      (i.toLong, (0 until 3 + i % 17).map(j => vocab((i * 7 + j * 5) % vocab.size))
        .mkString(" "))
    } :+ (40L, null.asInstanceOf[String]) :+ (41L, null.asInstanceOf[String])
    texts.toDF("doc_id", "text")
  }

  private def scores(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def assertSameScores(a: Map[Long, Double], b: Map[Long, Double]): Unit = {
    assert(a.keySet == b.keySet)
    a.foreach { case (id, s) =>
      assert(math.abs(s - b(id)) < 1e-9, s"doc $id: $s vs ${b(id)}")
    }
  }

  test("bm25: exploded tier == inline tier on the same small term set") {
    val terms = Seq("spark", "join", "fast")
    val inline = scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), terms, inlineTermLimit = 100))
    val exploded = scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), terms, inlineTermLimit = 0))
    assert(inline.nonEmpty)
    assertSameScores(inline, exploded)
  }

  test("bm25: >16 terms routes exploded and still matches the inline scores") {
    val terms = Seq("spark", "join", "fast", "slow", "shuffle", "scan",
      "sort", "hash", "merge", "plan", "code", "gen", "row", "col", "map",
      "agg", "sum", "min") // 18 > Bm25InlineTermLimit
    assert(terms.size > TextOps.Bm25InlineTermLimit)
    // default limit → exploded; forced high limit → inline
    val exploded = scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), terms))
    val inline = scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), terms, inlineTermLimit = 100))
    assert(exploded.nonEmpty)
    assertSameScores(inline, exploded)
  }

  test("bm25: duplicate query terms are deduped — same scores in both tiers") {
    val terms = Seq("spark", "join", "fast")
    val dup = terms ++ terms ++ Seq("spark")
    val base = scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), terms, inlineTermLimit = 100))
    assertSameScores(base, scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), dup, inlineTermLimit = 100)))
    assertSameScores(base, scores(TextOps.bm25(corpus, "doc_id",
      TextOps.tokens(col("text")), dup, inlineTermLimit = 0)))
  }

  test("bm25: null-text docs emit no rows and stay out of corpus stats") {
    val terms = Seq("spark")
    for (limit <- Seq(0, 100)) {
      val out = TextOps.bm25(corpus, "doc_id", TextOps.tokens(col("text")),
        terms, inlineTermLimit = limit)
      val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!ids.contains(40L) && !ids.contains(41L), s"tier limit=$limit")
    }
    // denominator check: scores must equal a corpus with the null docs
    // already dropped (i.e. null docs don't inflate N or avgdl)
    val dropped = corpus.where(col("text").isNotNull)
    assertSameScores(
      scores(TextOps.bm25(corpus, "doc_id", TextOps.tokens(col("text")), terms)),
      scores(TextOps.bm25(dropped, "doc_id", TextOps.tokens(col("text")), terms)))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkStats: struct fields match recomputed chunks at every length") {
    val sp = spark
    import sp.implicits._
    val size = 7; val stride = 5
    val texts = (0 until 26).map(n => (0 until n).map(i => s"t$i").mkString(" "))
    val rows = texts.toDF("text")
      .select(col("text"), TextOps.tokens(col("text")).as("__t"))
      .select(col("text"), posexplode(TextOps.chunkStats(col("__t"), size, stride)))
      .select(col("text"), col("pos"),
        col("col.n_chunk_tokens").as("n"), col("col.chunk_fp").as("fp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = r.getString(0).split(" ", -1).toSeq // matches split(text, " ")
      val start = r.getInt(1) * stride
      val slice = toks.slice(start, start + size)
      assert(r.getLong(2) == slice.length.toLong,
        s"count at len=${toks.length} pos=${r.getInt(1)}")
      assert(r.getString(3) == md5hex(slice.mkString(" ")),
        s"fp at len=${toks.length} pos=${r.getInt(1)}")
    }
    // coverage: last chunk reaches the final token for every length
    val byText = rows.groupBy(_.getString(0))
    byText.foreach { case (text, rs) =>
      val n = text.split(" ", -1).length
      val lastStart = rs.map(_.getInt(1)).max * stride
      assert(lastStart + size >= n, s"uncovered tail at len=$n")
    }
  }

  test("chunkStats: null token array yields null (no phantom chunk)") {
    val sp = spark
    import sp.implicits._
    val out = Seq(null.asInstanceOf[String]).toDF("text")
      .select(TextOps.chunkStats(TextOps.tokens(col("text")), 4, 2).as("c"))
      .head()
    assert(out.isNullAt(0))
  }
}
