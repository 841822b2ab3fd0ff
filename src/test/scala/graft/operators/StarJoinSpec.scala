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
}
