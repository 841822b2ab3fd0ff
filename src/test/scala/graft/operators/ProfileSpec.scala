package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The one-pass profile must agree with per-column queries computed
  * independently, and the corpus must actually exercise the null path.
  */
class ProfileSpec extends SparkTestBase {

  test("table_profile matches independent per-column stats; null path exercised") {
    val prof = Profile.tableProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 6)
    val ev = graft.Tables.events(spark, sf)
    val n = ev.count()

    // event_id is a PK: zero nulls, all distinct
    assert(prof("event_id").getLong(1) == 0L)
    assert(prof("event_id").getLong(2) == n)

    // value bounds agree with independent aggregation
    assert(prof("value").getLong(1) == ev.filter(col("value").isNull).count())
    assert(prof("value").getDouble(3) ==
      ev.agg(min(col("value"))).head().getDouble(0))

    // string column: numeric min/max are null, lexicographic bounds set
    val et = prof("event_type")
    assert(et.isNullAt(3) && et.isNullAt(4))
    assert(et.getString(5) == "click" && et.getString(6) == "view")
    assert(et.getLong(2) == ev.select(col("event_type")).distinct().count())

    // ts_us bounds agree with the raw column
    val bounds = ev.agg(min(expr("unix_micros(ts)")), max(expr("unix_micros(ts)")))
      .head()
    assert(prof("ts_us").getDouble(3) == bounds.getLong(0).toDouble)
    assert(prof("ts_us").getDouble(4) == bounds.getLong(1).toDouble)
  }

  test("dist_drift equals a BigInt replay of the 2xK chi-square reduction") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def lanes(r: (Long, String, String, Long)): Seq[(String, String)] = Seq(
      "lang" -> r._2, "source" -> r._3,
      "len_bucket" -> ("b" + math.min(r._4 / 200, 9L)))
    val counts = docs.flatMap(r => lanes(r).map(fb => (fb, r._1 % 2 == 1)))
      .groupBy(_._1).map { case (fb, xs) =>
        fb -> (xs.count(!_._2).toLong, xs.count(_._2).toLong)
      }
    val tot = counts.toSeq.groupBy(_._1._1).map { case (f, xs) =>
      f -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum)
    }
    val got = Profile.distDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.size == counts.size)
    counts.foreach { case ((f, b), (refN, curN)) =>
      val (refTot, curTot) = tot(f)
      val d = BigInt(curTot) * refN - BigInt(refTot) * curN
      val chi2 = BigInt(1000000) * d * d /
        (BigInt(refTot) * curTot * (refN + curN))
      val ppm = curN * 1000000L / curTot - refN * 1000000L / refTot
      assert(got((f, b)) == ((refN, curN, ppm, chi2.toLong)),
        s"bucket ($f, $b)")
    }
    // NB: no "tiny corpus must not drift" pin — at the 50-doc spec
    // corpus a 2-doc bucket landing all-odd is a legitimate chi2 of
    // 25, so the only honest invariant here is the exact replay above
  }

  test("corr_matrix equals an exact BigInt moment replay; corr in [-1, 1]") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (math.round(r.getDouble(0) * 100),
        math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100)))
    val n = BigInt(rows.length)
    def mom(f: ((Long, Long, Long)) => (Long, Long)): (BigInt, BigInt, BigInt) = {
      var sx, sy, sxy = BigInt(0)
      rows.foreach { r =>
        val (x, y) = f(r); sx += x; sy += y; sxy += BigInt(x) * y
      }
      (sx, sy, sxy)
    }
    def sq(f: ((Long, Long, Long)) => Long): BigInt =
      rows.map(r => { val x = BigInt(f(r)); x * x }).sum
    def corrOf(fx: ((Long, Long, Long)) => Long,
               fy: ((Long, Long, Long)) => Long): Double = {
      val (sx, sy, sxy) = mom(r => (fx(r), fy(r)))
      val cov = n * sxy - sx * sy
      val vx = n * sq(fx) - sx * sx
      val vy = n * sq(fy) - sy * sy
      val raw = cov.toDouble / math.sqrt(vx.toDouble) / math.sqrt(vy.toDouble)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Map(
      "q_p" -> corrOf(_._1, _._2),
      "q_d" -> corrOf(_._1, _._3),
      "p_d" -> corrOf(_._2, _._3))
    val got = Profile.corrMatrix(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == expected)
    assert(got.values.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("profile core: null counting and per-type min/max on a hand frame") {
    import spark.implicits._
    val df = Seq(
      (Some(1.5), Some("b")), (None, Some("a")), (Some(-2.0), None),
      (Some(1.5), Some("c")), (None, None))
      .toDF("x", "s")
    val p = Profile.profile(df, Seq("x"), Seq("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("x").getLong(1) == 2L)       // nulls
    assert(p("x").getLong(2) == 2L)       // distinct non-null {1.5, -2.0}
    assert(p("x").getDouble(3) == -2.0 && p("x").getDouble(4) == 1.5)
    assert(p("s").getLong(1) == 2L)
    assert(p("s").getLong(2) == 3L)
    assert(p("s").getString(5) == "a" && p("s").getString(6) == "c")
  }
}
