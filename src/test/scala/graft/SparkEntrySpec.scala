package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: every registered query must carry a DuckDB
  * oracle (a query without one only gets the driver's weaker rows-only
  * check — the round-4 multimodal_decode gap), and names must be
  * stable snake_case identifiers the driver's tooling can handle.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every registered query has an oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are snake_case identifiers; oracle SQL is non-empty") {
    SparkEntry.queries.keys.foreach { n =>
      assert(n.matches("[a-z][a-z0-9_]*"), n)
    }
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), n)
    }
  }
}
