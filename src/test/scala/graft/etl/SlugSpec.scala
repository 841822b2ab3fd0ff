package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** P1/P2 header machinery (reference assets.py:42-64 semantics). */
class SlugSpec extends AnyFunSuite {

  test("headerSlug strips parentheticals before slugifying") {
    assert(Slug.headerSlug("Full-Time Payroll (whole dollars)") == "fulltime_payroll")
    assert(Slug.headerSlug("Total Payroll (whole dollars)") == "total_payroll")
    assert(Slug.headerSlug("  Part-Time   Hours ") == "parttime_hours")
  }

  test("slugify order: whitespace->underscore, drop non-alnum, lower") {
    assert(Slug.slugify("Full-Time Employment") == "fulltime_employment")
    assert(Slug.slugify("a  b\tc") == "a_b_c") // all whitespace runs -> single underscore
    assert(Slug.slugify("Ünïcode Street") == "ncode_street") // non-ASCII dropped pre-NFKD (reference order)
  }

  test("collapseHeaders joins vertically, forces state/gov_function") {
    val rows = Vector(
      Vector[String](null, null, null, "Full-Time"),
      Vector[String](null, null, "Full-Time", "Payroll"),
      Vector[String]("State", "Government Function", "Employment", "(whole dollars)"),
      Vector[String]("US", "Total", "1", "2"))
    val names = Slug.collapseHeaders(rows, 0, 2)
    assert(names == Seq("state", "gov_function", "fulltime_employment", "fulltime_payroll"))
  }
}
