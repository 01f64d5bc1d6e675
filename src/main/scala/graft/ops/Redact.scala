package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines (north-star surface; the
  * reference corpus is PII-free Notion prose, so this generalizes the
  * pipeline the same way Dedup/Sampling do).
  *
  * Patterns are deliberately restricted to syntax with IDENTICAL semantics
  * in Java regex (Spark, codegen'd `regexp_replace`/`regexp_count`) and
  * RE2 (DuckDB) — character classes, bounded repetition, `\b`, no
  * lookaround, no backrefs — so every redaction is exactly replayable by
  * the SQL oracle. Replacement is a per-row scan projection: zero shuffle,
  * safe to run inline in any ingest job at corpus scale.
  */
object Redact {

  /** (name, pattern, replacement token), applied in order. Order matters:
    * emails first so their digit runs can't be half-eaten by the looser
    * numeric patterns; replacement tokens contain no digits or '@' so later
    * patterns can never match inside an earlier redaction.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Text with all [[PiiPatterns]] matches replaced by their tokens. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Match count for one named pattern (counts are taken on the ORIGINAL
    * text; patterns are mutually exclusive by construction on sane input —
    * an email's digits sit flush against letters/`@`, so `\b\d` can't fire
    * inside one).
    */
  def piiCount(text: Column, name: String): Column = {
    val pat = PiiPatterns.collectFirst { case (`name`, p, _) => p }
      .getOrElse(throw new IllegalArgumentException(
        s"unknown PII pattern '$name' (have ${PiiPatterns.map(_._1).mkString(", ")})"))
    regexp_count(text, lit(pat)).cast("long")
  }
}
