package graft.operators

import graft.SparkTestBase

/** Theil–Sen trend: hand-traced pairwise-slope medians (odd and even
  * pair counts), the robustness pin (one 1000× outlier month leaves
  * the median slope untouched where OLS would explode), and
  * full-corpus shape. The DuckDB oracle re-checks cross-engine.
  */
class TheilSenSpec extends SparkTestBase {

  private def run(rows: Seq[(String, Int, Long)]) = {
    import spark.implicits._
    Temporal.theilSen(rows.toDF("nation", "m", "rc")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
  }

  test("median slope ignores a 1000x outlier month (robustness pin)") {
    // steady +$1/month in cents, then month 5 explodes to $1000:
    // six clean pairwise slopes of 1.0 vs four contaminated ones
    // (250, 333, 499, 997) — the median stays exactly 1.0
    val got = run(Seq(("X", 1, 0L), ("X", 2, 100L), ("X", 3, 200L),
      ("X", 4, 300L), ("X", 5, 100000L)))
    assert(got("X") == ((5L, 10L, 1.0)))
  }

  test("even pair count averages the two middle slopes") {
    // months 1..4, cents 0,100,200,10000: sorted slopes
    // [1,1,1,33.3(3),49.5,98] -> median = (1 + 100/3)/2 = 17.166667
    val got = run(Seq(("Y", 1, 0L), ("Y", 2, 100L), ("Y", 3, 200L),
      ("Y", 4, 10000L)))
    assert(got("Y")._1 == 4L && got("Y")._2 == 6L)
    assert(math.abs(got("Y")._3 - 17.166667) < 1e-9)
    // two nations never mix pairs
    val two = run(Seq(("A", 1, 0L), ("A", 2, 100L),
      ("B", 1, 0L), ("B", 2, 500L)))
    assert(two("A")._3 == 1.0 && two("B")._3 == 5.0)
  }

  test("theil_sen_trend: one row per nation; pair count = C(n_months, 2)") {
    val rows = Temporal.theilSenTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nm, np) = (r.getLong(1), r.getLong(2))
      assert(np == nm * (nm - 1) / 2)
    }
    val n = graft.Tables.nation(spark, sf).count()
    assert(rows.length <= n && rows.length > 0)
  }
}
