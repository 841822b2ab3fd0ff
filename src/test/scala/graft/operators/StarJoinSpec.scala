package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The multi-way star joins must equal naive filter-last twins (the
  * declarative content is identical; only the shape differs), and the
  * planner must actually broadcast the fixed dims while keeping
  * fact-fact joins off the broadcast path.
  */
class StarJoinSpec extends SparkTestBase {

  test("star_shipping_priority: top-10, strictly ordered, equals unfiltered-join twin") {
    val got = StarJoin.shippingPriority(spark, sf).collect()
    assert(got.length <= 10 && got.nonEmpty)
    // revenue non-increasing, orderkey tiebreak
    got.sliding(2).foreach { case Array(a, b) =>
      val (ra, rb) = (a.getDouble(3), b.getDouble(3))
      assert(ra > rb || (ra == rb && a.getLong(0) < b.getLong(0)))
    case _ => ()
    }
    // naive twin: join everything, filter at the end
    val cut = lit("1998-06-01").cast("timestamp")
    val naive = graft.Tables.customer(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(graft.Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("o_orderdate") < cut && col("l_shipdate") > cut)
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("orderdate"),
        col("o_orderpriority"))
      .agg(graft.functions.ExactSum.sumExact(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .collect()
    assert(got.map(_.toSeq.toList).toList == naive.map(_.toSeq.toList).toList)
  }

  test("star_local_volume: equals post-filter twin; revenue positive per nation") {
    val got = StarJoin.localSupplierVolume(spark, sf)
    val naive = graft.Tables.region(spark, sf)
      .join(graft.Tables.nation(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .join(graft.Tables.customer(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.orders(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.lineitem(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("r_name") === "ASIA" &&
        col("s_nationkey") === col("c_nationkey") &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(graft.functions.ExactSum.sumExact(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    assert(got.collect().forall(_.getDouble(1) > 0))
  }

  test("planner broadcasts the dim side and shuffle-joins the fact-fact edges") {
    val plan = StarJoin.localSupplierVolume(spark, sf)
      .queryExecution.executedPlan.toString
    // nation/region reach customer as a broadcast
    assert(plan.contains("BroadcastHashJoin"))
    // orders-lineitem must NOT be a broadcast nested loop
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("bloom_prune_join: bloom is semantics-transparent and actually prunes") {
    val got = StarJoin.bloomPruneJoin(spark, sf)
    val ord = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val naive = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    // pruning: the probe-side filter keeps every matching row (no
    // false negatives) but drops most of the non-matching majority
    val bloomBin = ord.agg(graft.functions.BloomJoin
        .bloomAgg(col("o_orderkey"), 1000000L, 8000000L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val li = graft.Tables.lineitem(spark, sf)
    val total = li.count()
    val kept = li.filter(graft.functions.BloomJoin
      .mightContain(lit(bloomBin), col("l_orderkey"))).count()
    val matched = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= matched)     // no false negatives
    assert(kept < total / 2)    // the 7%-selective build side prunes the probe
  }

  test("small_qty_revenue: equals exact-rational driver replay") {
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity").cast("long"),
        col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brand = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val stats = li.groupBy(_._1).map { case (pk, rows) =>
      pk -> (rows.length.toLong, rows.map(_._2).sum)
    }
    // q < 0.2*avg decided as 5*q*n < sq — pure integers, no doubles
    val expected = li
      .filter { case (pk, q, _) =>
        val (n, sq) = stats(pk); 5 * q * n < sq
      }
      .groupBy(t => brand(t._1))
      .map { case (b, rows) =>
        val micros = rows.map(t => math.round(t._3 * 1e6)).sum
        (b, rows.length.toLong,
          (BigDecimal(micros) / BigDecimal(1000000)).toDouble)
      }.toSet
    val got = StarJoin.smallQtyRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("big_order_customers: equals integer driver replay; gate strictly above 250") {
    val totals = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val bigOrders = totals.filter(_._2 > 250)
    val got = StarJoin.bigOrderCustomers(spark, sf).collect()
    assert(got.map(_.getLong(2)).toSet == bigOrders.keySet)
    got.foreach { r =>
      assert(r.getLong(5) == bigOrders(r.getLong(2)))
      assert(r.getLong(5) > 250)
    }
  }

  test("top_supplier_revenue: argmax on integer micros, all ties kept") {
    val win0 = java.time.LocalDateTime.parse("1998-03-01T00:00:00")
    val win1 = java.time.LocalDateTime.parse("1998-06-01T00:00:00")
    val perSupp = graft.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount")).collect()
      .filter { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        !t.isBefore(win0) && t.isBefore(win1)
      }
      .map(r => (r.getLong(0),
        math.round(r.getDouble(2) * (1 - r.getDouble(3)) * 1e6)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val maxU = perSupp.values.max
    val winners = perSupp.filter(_._2 == maxU).keySet
    val got = StarJoin.topSupplierRevenue(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == winners)
    got.foreach { r =>
      assert(r.getDouble(2) ==
        (BigDecimal(maxU) / BigDecimal(1000000)).toDouble)
    }
  }

  test("supplier_share: threshold and ppm agree with BigInt replay; plan broadcasts the scalar") {
    val perSupp = graft.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .groupBy(_._1).map { case (k, v) => k -> (v.map(_._2).sum, v.length.toLong) }
    val total = BigInt(perSupp.values.map(_._1).sum)
    val nSupp = perSupp.size
    val expected = perSupp.collect {
      case (k, (vu, n)) if BigInt(vu) * nSupp > total =>
        (k, n, (BigInt(vu) * 1000000 / total).toLong)
    }.toSet
    val q = StarJoin.supplierShare(spark, sf)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the global total must come in as a broadcast, never a global window
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.toLowerCase.contains("window"))
  }

  test("late_order_census: equals epoch-day driver replay; semi join in the plan") {
    val shipDays = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val orders = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val expected = orders
      .filter { case (ok, _, od) =>
        shipDays.getOrElse(ok, Seq.empty[Int]).exists(_ > od + 90)
      }
      .groupBy(_._2).map { case (p, v) => (p, v.length.toLong) }.toSet
    val q = StarJoin.lateOrderCensus(spark, sf)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // EXISTS must plan as a semi join (one probe match, no fan-out)
    assert(q.queryExecution.executedPlan.toString.contains("LeftSemi"))
  }

  test("lapsed_rich_customers: integer mean gate + anti join equal a BigInt replay") {
    val custs = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val withOrders = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val balU = custs.map(c => c._1 -> math.round(c._3 * 1e6)).toMap
    val total = BigInt(balU.values.sum)
    val n = custs.length
    val expected = custs
      .filter(c => BigInt(balU(c._1)) * n > total && !withOrders(c._1))
      .groupBy(_._2)
      .map { case (seg, v) =>
        val segU = v.map(c => balU(c._1)).sum
        (seg, v.length.toLong,
          (BigDecimal(segU) / BigDecimal(1000000)).toDouble)
      }.toSet
    val got = StarJoin.lapsedRichCustomers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("nation_trade_flows: equals post-filter twin; regions structurally disjoint") {
    val got = StarJoin.nationTradeFlows(spark, sf)
    val regionOf = graft.Tables.nation(spark, sf)
      .join(graft.Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val naive = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(regionOf.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"), col("r_name").as("supp_region")),
        col("s_nationkey") === col("snk"))
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(regionOf.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"), col("r_name").as("cust_region")),
        col("c_nationkey") === col("cnk"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("supp_region") === "ASIA" && col("cust_region") === "AMERICA")
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(graft.functions.ExactSum.sumExact(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
    assert(got.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(got).count() == 0)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // supplier and customer nations come from disjoint regions
    rows.foreach(r => assert(r.getString(0) != r.getString(1)))
  }

  test("market_share: ppm agrees with BigInt replay; share bounded by 1e6") {
    // driver replay in exact integers over the joined scope
    val partType = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val suppNation = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nations = graft.Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val regions = graft.Tables.region(spark, sf)
      .select(col("r_regionkey").cast("long"), col("r_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val custNk = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val orders = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).cast("long"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val targetNk = nations.collectFirst {
      case (nk, (name, _)) if name == "NATION_3" => nk }.get
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { r =>
        val (ok, pk, sk) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val (ck, yr) = orders(ok)
        val custRegion = regions(nations(custNk(ck))._2)
        if (partType(pk) == "ECONOMY" && custRegion == "AMERICA")
          Some((yr, suppNation(sk) == targetNk,
            math.round(r.getDouble(3) * (1 - r.getDouble(4)) * 1e6)))
        else None
      }
    val expected = li.groupBy(_._1).map { case (yr, rows) =>
      val tot = BigInt(rows.map(_._3).sum)
      val tgt = BigInt(rows.filter(_._2).map(_._3).sum)
      (yr, rows.length.toLong, (tgt * 1000000 / tot).toLong)
    }.toSet
    val got = StarJoin.marketShare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    got.foreach { case (_, _, ppm) => assert(ppm >= 0 && ppm <= 1000000) }
  }

  test("customer_order_counts: masses conserve; zero-order bucket includes orderless customers") {
    val got = StarJoin.customerOrderCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nCust = graft.Tables.customer(spark, sf).count()
    val nOrd = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    // every customer lands in exactly one bucket
    assert(got.values.sum == nCust)
    // order mass conserves: sum(n_orders * n_customers) == filtered orders
    assert(got.map { case (n, c) => n * c }.sum == nOrd)
    // integer replay of the full histogram
    val perCust = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val allCust = graft.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val expected = allCust.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).map { case (n, v) => (n, v.size.toLong) }
    assert(got == expected)
  }

  test("waiting_supplier_census: equals epoch-day driver replay") {
    val orderDay = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val perSupp = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((ok, sk), rows) =>
        (ok, sk, rows.exists(_._3 > orderDay(ok) + 90)) }
    val byOrder = perSupp.groupBy(_._1)
    val expected = byOrder.toSeq
      .filter { case (_, supps) =>
        supps.size >= 2 && supps.count(_._3) == 1 }
      .map { case (_, supps) => supps.find(_._3).get._2 }
      .groupBy(identity).map { case (sk, v) => (sk, v.size.toLong) }.toSet
    val got = StarJoin.waitingSupplierCensus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("returned_item_revenue: top-20 equals integer-micros driver replay") {
    val win0 = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val win1 = java.time.LocalDateTime.parse("1998-04-01T00:00:00")
    val custOf = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")).collect()
      .filter { r =>
        val t = r.getAs[java.time.LocalDateTime](2)
        !t.isBefore(win0) && t.isBefore(win1)
      }.map(r => (r.getLong(0), r.getLong(1))).toMap
    val perCust = graft.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .flatMap { r =>
        custOf.get(r.getLong(0)).map(ck =>
          (ck, math.round(r.getDouble(1) * (1 - r.getDouble(2)) * 1e6)))
      }
      .groupBy(_._1).map { case (ck, v) => (ck, v.map(_._2).sum, v.length.toLong) }
    val top = perCust.toSeq.sortBy { case (ck, ru, _) => (-ru, ck) }.take(20)
    val got = StarJoin.returnedItemRevenue(spark, sf).collect()
    assert(got.length == top.length)
    got.zip(top).foreach { case (r, (ck, ru, n)) =>
      assert(r.getLong(0) == ck)
      assert(r.getLong(3) == n)
      assert(r.getDouble(4) == (BigDecimal(ru) / BigDecimal(1000000)).toDouble)
    }
  }

  test("late_shipment_census: equals epoch-day conditional replay; masses partition") {
    val prio = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))).collect()
      .flatMap { r =>
        val (p, od) = prio(r.getLong(0))
        if (r.getInt(2) > od + 60)
          Some((r.getString(1), Set("1-URGENT", "2-HIGH")(p)))
        else None
      }
    val expected = rows.groupBy(_._1).map { case (f, v) =>
      (f, v.count(_._2).toLong, v.count(!_._2).toLong) }.toSet
    val got = StarJoin.lateShipmentCensus(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("disjunctive_revenue: equals replay; brand OR-filter pushed to the part scan") {
    val brandOf = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_size")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getAs[Number](2).longValue))).toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { r =>
        val (b, sz) = brandOf(r.getLong(0))
        val q = r.getDouble(1)
        val keep =
          (b == "Brand#1" && sz >= 1 && sz <= 15 && q >= 1 && q <= 11) ||
          (b == "Brand#2" && sz >= 1 && sz <= 25 && q >= 10 && q <= 20) ||
          (b == "Brand#3" && sz >= 1 && sz <= 35 && q >= 20 && q <= 30)
        if (keep)
          Some((b, math.round(r.getDouble(2) * (1 - r.getDouble(3)) * 1e6)))
        else None
      }
    val expected = rows.groupBy(_._1).map { case (b, v) =>
      (b, (BigDecimal(v.map(_._2).sum) / BigDecimal(1000000)).toDouble,
        v.length.toLong) }.toSet
    val q = StarJoin.disjunctiveRevenue(spark, sf)
    val got = q.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the brand disjunction must reach the part scan as a pushed/scan
    // filter, not wait for the post-join residual
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Brand#1") && plan.contains("Brand#3"))
  }

  test("supplier_diversity: equals distinct-set driver replay; excluded brand absent") {
    val pInfo = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_size")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getAs[Number](2).longValue / 10 * 10)))
      .toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .flatMap { r =>
        val (b, sb) = pInfo(r.getLong(0))
        if (b != "Brand#1") Some(((b, sb), r.getLong(1))) else None
      }
    val expected = rows.groupBy(_._1).map { case ((b, sb), v) =>
      (b, sb, v.map(_._2).distinct.length.toLong, v.length.toLong) }.toSet
    val got = StarJoin.supplierDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    assert(!got.exists(_._1 == "Brand#1"))
  }

  test("promo_share_monthly: ppm equals BigInt replay; share bounded") {
    val isPromo = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_type")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "ECONOMY")).toMap
    val win0 = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val win1 = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        if (!t.isBefore(win0) && t.isBefore(win1))
          Some((t.getYear * 100 + t.getMonthValue, isPromo(r.getLong(0)),
            math.round(r.getDouble(2) * (1 - r.getDouble(3)) * 1e6)))
        else None
      }
    val expected = rows.groupBy(_._1).map { case (m, v) =>
      val tot = BigInt(v.map(_._3).sum)
      val promo = BigInt(v.filter(_._2).map(_._3).sum)
      (m, v.length.toLong, (promo * 1000000 / tot).toLong)
    }.toSet
    val got = StarJoin.promoShareMonthly(spark, sf).collect()
      .map { r =>
        val d = r.getDate(0).toLocalDate
        (d.getYear * 100 + d.getMonthValue, r.getLong(1), r.getLong(3))
      }.toSet
    assert(got == expected)
    assert(got.size == 12)
    got.foreach { case (_, _, ppm) => assert(ppm >= 0 && ppm <= 1000000) }
  }
}
