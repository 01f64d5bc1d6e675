package graft

import org.apache.spark.sql.functions._

import graft.ops.{Redact, TextOps}

/** PII redaction + Gopher-repetition signals: hand-built edge cases plus a
  * randomized differential against plain-Scala reference implementations.
  */
class RedactSpec extends SparkTestBase {

  private def oneStr(c: org.apache.spark.sql.Column, text: String): String = {
    val sp = spark
    import sp.implicits._
    Seq(text).toDF("text").select(c).head().getString(0)
  }

  private def oneLong(c: org.apache.spark.sql.Column, text: String): Long = {
    val sp = spark
    import sp.implicits._
    Seq(text).toDF("text").select(c).head().getLong(0)
  }

  test("redactPii replaces emails, IPs, and SSNs with tokens") {
    val in = "mail a.b+c@ex-a.co.jp node 10.0.0.1 id 123-45-6789 done"
    assert(oneStr(Redact.redactPii(col("text")), in) ==
      "mail <EMAIL> node <IP> id <SSN> done")
  }

  test("redaction leaves near-miss text untouched") {
    val in = "not-an-ip 10.0.0 not-an-email foo@bar version 1.2.3.4.5 ok 12-34-5678"
    // 1.2.3.4.5: the first four octets DO match the ipv4 pattern (the regex
    // is boundary- not context-anchored) — document that contract.
    assert(oneStr(Redact.redactPii(col("text")), in) ==
      "not-an-ip 10.0.0 not-an-email foo@bar version <IP>.5 ok 12-34-5678")
  }

  test("piiCount counts non-overlapping matches per family") {
    val in = "a@b.co c@d.org 1.2.3.4 999-99-9999 and 10.20.30.40"
    assert(oneLong(Redact.piiCount(col("text"), "email"), in) == 2L)
    assert(oneLong(Redact.piiCount(col("text"), "ipv4"), in) == 2L)
    assert(oneLong(Redact.piiCount(col("text"), "ssn"), in) == 1L)
    intercept[IllegalArgumentException](Redact.piiCount(col("text"), "nope"))
  }

  test("replacement tokens are fixed points: redacting twice changes nothing") {
    val in = "x 1.2.3.4 y me@ex.io z 123-45-6789"
    val once = oneStr(Redact.redactPii(col("text")), in)
    assert(oneStr(Redact.redactPii(col("text")), once) == once)
  }

  // ---- repetition signals ----

  /** Reference: most-frequent n-gram count via plain Scala. */
  private def refTopNGram(text: String, n: Int): Long = {
    val toks = text.split(" ", -1).toSeq
    if (toks.size < n) 0L
    else toks.sliding(n).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size).max.toLong
  }

  test("topNGramCount matches the groupBy reference on edge texts") {
    val texts = Seq("", "a", "a a", "a a a a", "a b a b a b",
      "x y z x y z x y", "  a  b ", "solo run solo run solo")
    for (t <- texts; n <- Seq(2, 3)) {
      assert(oneLong(TextOps.topNGramCount(col("text"), n), t) == refTopNGram(t, n),
        s"text='$t' n=$n")
    }
  }

  test("topNGramCount differential on randomized small-vocab texts") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Seq("a", "b", "c", "d")
    val texts = Seq.fill(60)(
      Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val got = texts.toDF("text")
      .select(TextOps.topNGramCount(col("text"), 2).as("t2"),
        TextOps.topNGramCount(col("text"), 3).as("t3"))
      .collect()
    texts.zip(got).foreach { case (t, row) =>
      assert(row.getLong(0) == refTopNGram(t, 2), s"2-gram on '$t'")
      assert(row.getLong(1) == refTopNGram(t, 3), s"3-gram on '$t'")
    }
  }

  test("distinct/total token counts and the repetitive flag") {
    val sp = spark
    import sp.implicits._
    val df = Seq("spam spam spam spam spam", "all words here are different")
      .toDF("text")
      .select(
        TextOps.tokenCount(col("text")).as("n"),
        TextOps.distinctTokenCount(col("text")).as("d"),
        TextOps.topNGramCount(col("text"), 2).as("t2"),
        TextOps.nGramCount(col("text"), 2).as("n2"),
        TextOps.topNGramCount(col("text"), 3).as("t3"),
        TextOps.nGramCount(col("text"), 3).as("n3"))
      .withColumn("rep", TextOps.repetitiveFlag(
        col("n"), col("d"), col("t2"), col("n2"), col("t3"), col("n3")))
      .collect()
    assert(df(0).getAs[Boolean]("rep"))      // pure repetition
    assert(!df(1).getAs[Boolean]("rep"))     // all-distinct prose
    assert(df(0).getLong(1) == 1L && df(1).getLong(1) == 5L)
  }

  test("repetition signals stay shuffle-free (no Exchange in the plan)") {
    val sp = spark
    import sp.implicits._
    val plan = Seq("a b c").toDF("text")
      .select(TextOps.topNGramCount(col("text"), 2),
        TextOps.distinctTokenCount(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
