package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** X2/X3/X4/J2 scalar semantics (SURVEY.md §2.8). */
class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  test("cleanNumeric: commas, unicode minus variants, accounting negatives") {
    val in = Seq("1,234", "−5,678", "–42", "—7", "(1,234)", "(9)", "junk", "12.5", "")
      .toDF("s")
    val got = in.select(Cleaning.cleanNumeric($"s")).as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(1234d), Some(-5678d), Some(-42d), Some(-7d),
      Some(-1234d), Some(-9d), None, Some(12.5), None))
  }

  test("safeDiv: zero and null divisors yield null, never inf") {
    val in = Seq((10d, 2d), (10d, 0d), (10d, Double.NaN)).toDF("a", "b")
    val got = in.select(Cleaning.safeDiv($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 5d)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0).isNaN) // NaN divisor propagates as NaN, not inf
  }

  test("recode: mapped values replaced, unmatched pass through") {
    val in = Seq("correction", "hospitals", "police-other").toDF("f")
    val m = Map("correction" -> "corrections", "police-other" -> "police protection - other")
    val got = in.select(Cleaning.recode($"f", m)).as[String].collect()
    assert(got.toSeq == Seq("corrections", "hospitals", "police protection - other"))
  }

  test("classify: match chain with default") {
    val in = Seq("US", "WI", "US-median").toDF("c")
    val got = in.select(Cleaning.classify($"c", Seq("US" -> "national"), "state"))
      .as[String].collect()
    assert(got.toSeq == Seq("national", "state", "state"))
  }
}
