package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExactSum

/** Multi-way star-schema join analytics — the TPC-H Q3/Q5 shapes that
  * exercise the join-planning decisions a 100 TB warehouse lives on:
  * which joins broadcast (fixed dims: region, nation), which stay
  * keyed shuffles (fact-to-fact: orders⋈lineitem, customer⋈orders —
  * both sides scale with the data, so a broadcast would OOM at SF100+),
  * and where selective dimension filters must reach the probe side
  * BEFORE the big shuffle (filter-then-join, never join-then-filter).
  *
  * Both queries keep the plan declarative — no join hints — so
  * Catalyst + AQE pick broadcast vs shuffle per actual build-side
  * size at whatever scale the query runs. The shapes are chosen so
  * the right plan exists at every scale: dimension filters are narrow
  * scan predicates (pushed to parquet), every join is an equi-join on
  * a single key, and revenue sums run in integer micros (ExactSum) so
  * totals are order-independent and byte-reproducible cross-engine.
  */
object StarJoin {

  private val Cutoff = "1998-06-01"

  /** TPC-H Q3 shape — shipping priority: revenue of not-yet-shipped
    * lineitems for BUILDING-segment customers' pre-cutoff orders,
    * top 10 orders by revenue. Join tree: customer(σ segment) is
    * 1/5-selective and only c_custkey survives the projection;
    * orders(σ date) ⋈ customer on custkey, then ⋈ lineitem(σ shipdate)
    * on orderkey — the fact-fact join runs AFTER both filters, so the
    * shuffle carries the filtered minority of each table. Top-10
    * ordering is (revenue desc, orderkey): revenue is an exact
    * micros sum, so the order is engine-independent.
    */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = lit(Cutoff).cast("timestamp")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("orderdate"), col("o_orderpriority"))
      .agg(ExactSum.microsToDouble(sum(col("rev_u"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape — local supplier volume: revenue from ASIA
    * customers served by a supplier in the customer's own nation,
    * one row per nation. Join tree: region(σ ASIA) ⋈ nation are
    * fixed-size dims — Catalyst broadcasts them into the customer
    * scan; customer ⋈ orders(σ date window) and orders ⋈ lineitem are
    * the two keyed fact shuffles; supplier joins on
    * (l_suppkey, c_nationkey = s_nationkey) — the second predicate is
    * part of the join key, NOT a post-filter, so the "local" check
    * never materializes the non-local majority of the join.
    */
  def localSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val cut = lit(Cutoff).cast("timestamp")
    val asiaNations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(ExactSum.microsToDouble(sum(col("rev_u"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Market-basket co-occurrence: part pairs appearing together in at
    * least 2 orders. Quadratic only within one order's basket (TPC-H
    * baskets are <= 7 lines), so pair volume is sum-of-squares of
    * basket sizes: linear in orders, NEVER corpus x corpus. Same
    * blocking discipline as the dedup family (the "block key" here is
    * the natural basket).
    *
    * Shape (r6): ONE shuffle builds per-order sorted distinct baskets
    * (collect_set dedups a part on two lines of the same order), then
    * the pair explosion is a narrow in-array HOF (i<j over the sorted
    * basket = part_a < part_b), then ONE pair aggregation — two
    * exchanges total. The previous distinct + self-join shape paid a
    * third exchange re-partitioning the distinct output onto
    * l_orderkey for the join (same 35,730 rows; sf1 warm times are
    * exchange-bound and ambient-noisy — the win is the removed 6M-row
    * exchange, which compounds at cluster scale where every exchange
    * is network, not page cache).
    *
    * The classic a-priori single-item prune (drop parts in < 2 orders
    * before pairing) was measured a NO-OP on this corpus — every part
    * appears in >= 2 orders at every sf (uniform synthetic keys; no
    * frequency-1 tail), so it would add a shuffle and remove nothing.
    * At 100 TB with a power-law part tail it becomes worthwhile; it
    * composes here as one extra semi-join on the basket build.
    */
  def basketPairs(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    baskets
      .select(explode(expr(
        """flatten(transform(ps, (a, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    b -> struct(a AS part_a, b AS part_b))))""".stripMargin)).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
  }

  /** Bloom-pruned fact join — the explicit runtime-filter shape: build
    * a bloom filter over the SELECTIVE side's keys (urgent finished
    * orders, ~7% of the table), prune lineitem with `might_contain`
    * BEFORE its join shuffle, then join exactly. The bloom's false
    * positives are removed by the exact join, so the result is
    * identical to the plain join (the oracle IS the plain join) — the
    * bloom only cuts the probe-side shuffle from all of lineitem to
    * ~the matching fraction. At 100 TB this is the semi-join reduction
    * that decides fact-to-fact cost when the optimizer's own
    * InjectRuntimeFilter heuristics decline (e.g. the build side is
    * the output of an upstream stage, not a scan).
    *
    * The one driver-side action is collecting the 100 KB sketch — the
    * exact analogue of the subquery execution Spark's own runtime
    * filter performs; nothing row-shaped ever reaches the driver.
    * Revenue sums in integer cents so the per-month totals are
    * order-independent and byte-reproducible cross-engine.
    */
  def bloomPruneJoin(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val bloomBin = ord
      .agg(graft.functions.BloomJoin.bloomAgg(col("o_orderkey"), 1000000L, 8000000L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(graft.functions.BloomJoin.mightContain(lit(bloomBin), col("l_orderkey")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "star_shipping_priority" -> (shippingPriority _),
    "star_local_volume" -> (localSupplierVolume _),
    "basket_pairs" -> (basketPairs _),
    "bloom_prune_join" -> (bloomPruneJoin _)
  )

  val oracleSql: Map[String, String] = Map(
    "star_shipping_priority" ->
      s"""SELECT o_orderkey, o_orderdate::DATE AS orderdate, o_orderpriority,
         | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
         |FROM customer
         | JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         | AND o_orderdate < TIMESTAMP '$Cutoff'
         | AND l_shipdate > TIMESTAMP '$Cutoff'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,

    "star_local_volume" ->
      s"""SELECT n_name,
         | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
         | count(*) AS n_items
         |FROM region
         | JOIN nation ON n_regionkey = r_regionkey
         | JOIN customer ON c_nationkey = n_nationkey
         | JOIN orders ON o_custkey = c_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         | AND o_orderdate >= TIMESTAMP '1996-01-01'
         | AND o_orderdate < TIMESTAMP '$Cutoff'
         |GROUP BY 1""".stripMargin,

    "basket_pairs" ->
      """WITH items AS (
        | SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        | count(*) AS n_orders
        |FROM items a
        | JOIN items b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    // the bloom is semantics-transparent (false positives die in the
    // exact join) — the oracle is the PLAIN join
    "bloom_prune_join" ->
      """SELECT date_trunc('month', o_orderdate)::DATE AS month,
        | count(*) AS n_items,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |GROUP BY 1""".stripMargin
  )
}
