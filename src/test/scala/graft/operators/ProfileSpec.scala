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
