package graft

/** Driver-contract invariants for SparkEntry: every registered query MUST
  * carry a DuckDB oracle (a missing oracle silently downgrades that query
  * to a rows-only check in the driver's gate), names must be unique across
  * the merged catalogs, and the flagship entry must return rows.
  */
class EntryContractSpec extends SparkTestBase {

  test("every registered query has an oracle, and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL never contains a stripMargin artifact") {
    // the r5 pii_redact failure mode: a '|' surviving at the start of a
    // continuation line after a nested-interpolation stripMargin ate its
    // twin. Legitimate oracle SQL never starts a line with a single '|'.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      sql.linesIterator.zipWithIndex.foreach { case (line, i) =>
        assert(!line.trim.startsWith("|"),
          s"$name line ${i + 1} starts with '|' — stripMargin corruption: $line")
      }
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
