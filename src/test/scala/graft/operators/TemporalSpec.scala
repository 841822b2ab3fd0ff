package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The scalable shapes (union+window as-of, grid-bucketed interval
  * join, range window) must equal their naive inequality-join twins.
  */
class TemporalSpec extends SparkTestBase {

  test("asof_join == naive greatest-click-at-or-before join") {
    val got = Temporal.asofJoin(spark, sf)
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("cu"), col("us").as("cus"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
    val naive = purchases
      .join(clicks, col("user_id") === col("cu") && col("cus") <= col("us"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("purchase_id"))
          .orderBy(col("cus").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"), col("us").as("purchase_us"),
        col("click_id"), (col("us") - col("cus")).as("gap_us"))
    assert(got.count() == purchases.count())
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
  }

  test("range_window_count == naive self-join count") {
    val got = Temporal.rangeWindowCount(spark, sf)
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("CAST(unix_timestamp(ts) AS LONG)").as("epoch_s"),
        expr("coalesce(value, 0.0)").as("v"))
    val other = ev.select(col("user_id").as("bu"), col("epoch_s").as("bs"),
      col("v").as("bv"))
    val naive = ev
      .join(other, col("user_id") === col("bu") &&
        col("bs") >= col("epoch_s") - 300 && col("bs") <= col("epoch_s") - 1, "left")
      .groupBy(col("event_id"), col("user_id"), col("epoch_s"))
      .agg(count(col("bu")).as("n_prev_5m"),
        coalesce(round(sum(col("bv")), 6), lit(0.0)).as("sum_prev_5m"))
    assert(got.count() == ev.count())
    assert(got.exceptAll(naive).count() == 0)
  }

  test("interval_band_join == naive inequality join; overlap is many-to-many") {
    val got = Temporal.intervalBandJoin(spark, sf)
    import spark.implicits._
    val b = Temporal.bands.toDF("band_name", "lo", "hi")
    val naive = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"))
      .join(b, col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .select(col("p_partkey"), col("band_name"), col("p_retailprice"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    // the overlapping premium band makes some parts match 2 bands
    val multi = got.groupBy(col("p_partkey")).count().filter(col("count") >= 2)
    assert(multi.count() > 0)
  }

  test("retention_cohorts: offset-0 mass == user base; retention never exceeds cohort size") {
    val m = Temporal.retentionCohorts(spark, sf).collect()
      .map(r => ((r.getDate(0), r.getLong(1)), r.getLong(2))).toMap
    assert(m.keys.forall(_._2 >= 0))
    // every user is active in their own first week
    val totalUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val offset0 = m.collect { case ((_, 0L), n) => n }.sum
    assert(offset0 == totalUsers)
    // a cohort's later cells never exceed its size
    m.foreach { case ((cohort, off), n) =>
      if (off > 0) assert(n <= m((cohort, 0L)), s"$cohort offset $off")
    }
  }
}
