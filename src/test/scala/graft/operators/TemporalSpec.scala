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

  test("funnel_steps: strict ordering, depth consistency, naive per-user replay") {
    val rows = Temporal.funnelSteps(spark, sf).collect()
    // depth agrees with which step times are present; times strictly increase
    rows.foreach { r =>
      val t1 = r.getLong(1)
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val depth = r.getInt(4)
      assert(depth == (1 + t2.size + t3.size))
      if (t3.isDefined) assert(t2.isDefined)
      t2.foreach(v => assert(v > t1))
      (t2, t3) match { case (Some(a), Some(b)) => assert(b > a); case _ => () }
    }
    // one row per user with >= 1 view
    val viewers = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.length == viewers)
    // naive replay on a sample of users: earliest view, earliest later
    // click, earliest later purchase
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().groupBy(_.getLong(0))
    rows.take(50).foreach { r =>
      val uid = r.getLong(0)
      val mine = ev(uid).map(e => (e.getString(1), e.getLong(2)))
      val t1 = mine.collect { case ("view", us) => us }.min
      val t2 = mine.collect { case ("click", us) if us > t1 => us }
        .sorted.headOption
      val t3 = t2.flatMap(t => mine.collect { case ("purchase", us) if us > t => us }
        .sorted.headOption)
      assert(r.getLong(1) == t1)
      assert((if (r.isNullAt(2)) None else Some(r.getLong(2))) == t2)
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == t3)
    }
  }

  test("timeseries_fill: complete grid, explicit zeros, mass conservation") {
    val rows = Temporal.timeseriesFill(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .select(expr("CAST(unix_timestamp(ts) AS LONG) div 3600").as("h"),
        col("event_type"))
    val (lo, hi) = {
      val r = ev.agg(min(col("h")), max(col("h"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val nTypes = ev.select(col("event_type")).distinct().count()
    // the grid is complete: every (hour, type) cell exists exactly once
    assert(rows.length == (hi - lo + 1) * nTypes)
    assert(rows.map(r => (r.getLong(0), r.getString(1))).distinct.length == rows.length)
    // zero-filled gaps genuinely occur on this corpus
    assert(rows.exists(_.getLong(2) == 0L))
    // total event mass is conserved
    assert(rows.map(_.getLong(2)).sum == ev.count())
  }

  test("user_growth_curve: firsts sum to user base, cum monotone, active >= new") {
    val rows = Temporal.userGrowthCurve(spark, sf).collect()
      .sortBy(_.getDate(0).toString)
    val totalUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalUsers)
    assert(rows.last.getLong(3) == totalUsers)
    // cumulative = running sum of new; active bounded by cumulative
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(3) == cum)
      assert(r.getLong(2) <= cum && r.getLong(2) >= r.getLong(1))
    }
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

  test("mannwhitney_value: u2 equals a driver midrank replay; U symmetry holds") {
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val rows = graft.Tables.events(spark, sf)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), hash60(r.getLong(1).toString) % 2, r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val byVal = g.groupBy(_._3).toSeq.sortBy(_._1)
      var before = 0L
      var r2 = 0L; var n0 = 0L; var n1 = 0L
      byVal.foreach { case (_, vs) =>
        val cv = vs.length.toLong
        val c0 = vs.count(_._2 == 0).toLong
        r2 += c0 * (2 * before + cv + 1)
        n0 += c0; n1 += cv - c0
        before += cv
      }
      et -> ((n0, n1, r2 - n0 * (n0 + 1)))
    }
    val got = Temporal.mannwhitneyValue(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // U symmetry: U0 + U1 = n0*n1 (in doubled units: u2_0 + u2_1 = 2*n0*n1);
    // verified via the identity u2 = 2*R0 - 2*n0*(n0+1)/2, so
    // 0 <= u2 <= 2*n0*n1
    got.values.foreach { case (n0, n1, u2) =>
      assert(u2 >= 0 && u2 <= 2 * n0 * n1)
    }
  }

  test("ab_chi2: equals an exact BigInt driver replay; masses partition the user base") {
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val users = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nu = users.length.toLong
    val tot = users.map(_._2).sum
    val cells = users.map { case (uid, np) =>
      (hash60(uid.toString) % 2, np * nu > tot)
    }
    val a = cells.count(x => x._1 == 0 && x._2).toLong
    val b = cells.count(x => x._1 == 0 && !x._2).toLong
    val c = cells.count(x => x._1 == 1 && x._2).toLong
    val dd = cells.count(x => x._1 == 1 && !x._2).toLong
    val num = BigInt(1000000) * BigInt(a + b + c + dd) *
      BigInt(a * dd - b * c).pow(2)
    val den = BigInt(a + b) * BigInt(c + dd) * BigInt(a + c) * BigInt(b + dd)
    val expChi = if (den > 0) (num / den).toLong else -1L
    val row = Temporal.abChi2(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((a, b, c, dd)))
    assert(a + b + c + dd == nu)
    if (den > 0) {
      assert(row.getLong(4) == expChi)
      assert(row.getBoolean(5) == (num > BigInt(3841459) * den))
    } else assert(row.isNullAt(4) && row.isNullAt(5))
  }

  test("seasonal_adjust: equals a driver replay; top-5 per type by |residual|") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), datediff(col("day"), lit("1970-01-01")).cast("long"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val prof = daily.groupBy(d => (d._1, d._2 % 7)).map { case (k, v) =>
      k -> (1000000L * v.map(_._3).sum) / v.size
    }
    val expected = daily.map { case (et, ed, n) =>
      val m = prof((et, ed % 7))
      (et, ed, ed % 7, n, m, n * 1000000L - m)
    }.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (-math.abs(r._6), r._2)).take(5)
        .zipWithIndex.map { case (r, i) => (r._1, r._2, r._3, r._4, r._5, r._6, i + 1L) }
        .toSeq
    }.toSet
    val got = Temporal.seasonalAdjust(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("session_paths: equals a driver-side sessionize-and-path replay") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // replay: per user, order by (micros, event_id), break sessions on
    // >1800 s epoch-second gaps, path = first 4 types
    val sessions = evs.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val out = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var lastEs = Long.MinValue
      ordered.foreach { case (_, _, tsUs, tpe) =>
        val es = Math.floorDiv(tsUs, 1000000L)
        if (lastEs == Long.MinValue || es - lastEs > 1800) {
          if (cur.nonEmpty) out += cur.toList
          cur = scala.collection.mutable.ArrayBuffer.empty[String]
        }
        cur += tpe
        lastEs = es
      }
      if (cur.nonEmpty) out += cur.toList
      out
    }.toList
    val expected = sessions
      .groupBy(sess => sess.take(4).mkString(">"))
      .map { case (p, ss) => (p, ss.length.toLong, ss.map(_.length.toLong).sum) }
      .toSet
    val got = Temporal.sessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // mass conservation: total_events over all paths == corpus size
    assert(got.toSeq.map(_._3).sum == evs.length.toLong)
  }
}
