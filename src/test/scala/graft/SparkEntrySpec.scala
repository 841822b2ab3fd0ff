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

  test("no oracle casts a summed DECIMAL straight to DOUBLE (double-rounding lint)") {
    // DuckDB's DECIMAL->DOUBLE cast double-rounds (int128 -> double,
    // then / 10^scale) and landed one ulp off Spark's correctly-
    // rounded Decimal.toDouble at sf1 magnitudes (rollup_revenue 'A'
    // subtotal, r6). Any summed-decimal value leaving an oracle as a
    // double must route DECIMAL -> VARCHAR -> DOUBLE (fast_float
    // parse, correctly rounded). This lint catches the fragile form
    // `CAST(sum(...DECIMAL...) AS DOUBLE)` with no VARCHAR hop.
    val fragile = """CAST\(\s*sum\([^)]*DECIMAL[\s\S]*?\)\s*AS\s+DOUBLE\)""".r
    val offenders = SparkEntry.oracleSql.collect {
      case (n, sql)
          if fragile.findFirstIn(sql).exists(!_.contains("VARCHAR")) =>
        n
    }
    assert(offenders.isEmpty,
      s"oracles with direct DECIMAL->DOUBLE casts: ${offenders.toSeq.sorted}")
  }
}
