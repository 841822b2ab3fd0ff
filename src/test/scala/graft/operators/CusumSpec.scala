package graft.operators

import graft.SparkTestBase

/** CUSUM change-point: hand-traced prefix-sum factorization (step
  * shift accumulates to a corpus-end peak, a mid-series burst peaks at
  * the burst's LAST day — not the corpus end), constant series stays
  * flat, and full-corpus lane sanity. The DuckDB oracle re-checks the
  * window algebra cross-engine.
  */
class CusumSpec extends SparkTestBase {

  private def run(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    Temporal.cusum(rows.toDF("event_type", "day", "n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
  }

  test("step shift: drift accumulates, peak at the series end") {
    // [10,10,10,20,20,20]: T=90, D=6, e = n*6-90 = [-30x3, +30x3]
    // S = [-30,-60,-90,-60,-30,0], minS = [-30,-60,-90,...]
    // cusum = [0,0,0,30,60,90] -> only day 5 peaks
    val got = run((0L to 5L).map(d =>
      ("a", d, if (d < 3) 10L else 20L)))
    assert((0L to 4L).forall(d => !got(("a", d))._2))
    assert(got(("a", 3L))._1 == 30L && got(("a", 4L))._1 == 60L)
    assert(got(("a", 5L)) == ((90L, true)))
  }

  test("mid-series burst peaks at the burst's last day, not the corpus end") {
    // [10,10,30,30,10,10]: T=100, D=6, e = [-40,-40,80,80,-40,-40]
    // S = [-40,-80,0,80,40,0], cusum = [0,0,80,160,120,80]
    val got = run((0L to 5L).map(d =>
      ("b", d, if (d == 2 || d == 3) 30L else 10L)))
    assert(got(("b", 3L)) == ((160L, true)))
    assert(!got(("b", 4L))._2 && !got(("b", 5L))._2)
    assert(got(("b", 5L))._1 == 80L)
  }

  test("constant rate never alarms; types are independent") {
    val got = run(
      (0L to 3L).map(d => ("flat", d, 7L)) ++
        (0L to 3L).map(d => ("shift", d, if (d < 2) 1L else 5L)))
    (0L to 3L).foreach { d =>
      assert(got(("flat", d)) == ((0L, false)))
    }
    assert(got(("shift", 3L))._2)
  }

  test("cusum_drift: rows == (type, day) pairs; cusum >= 0; every type has <= its days peaks") {
    val rows = Temporal.cusumDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0L))
    val daily = graft.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("unix_micros(ts) div 86400000000"))
      .count().count()
    assert(rows.length == daily)
  }
}
