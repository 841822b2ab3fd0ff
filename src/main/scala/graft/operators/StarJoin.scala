package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExactSum

/** Multi-way star-schema join analytics — the TPC-H query shapes
  * (Q3/Q4/Q5/Q7/Q8/Q10/Q12/Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q21/Q22, plus
  * basket pairs and the explicit bloom-prune join) that exercise the
  * join-planning decisions a 100 TB warehouse lives on: which joins
  * broadcast (fixed dims: region, nation), which stay keyed shuffles
  * (fact-to-fact: orders⋈lineitem, customer⋈orders — both sides scale
  * with the data, so a broadcast would OOM at SF100+), and where
  * selective dimension filters must reach the probe side BEFORE the
  * big shuffle (filter-then-join, never join-then-filter).
  *
  * Every query keeps the plan declarative — no join hints — so
  * Catalyst + AQE pick broadcast vs shuffle per actual build-side
  * size at whatever scale the query runs. The shapes are chosen so
  * the right plan exists at every scale: dimension filters are narrow
  * scan predicates (pushed to parquet), every join is an equi-join on
  * a single key, and revenue sums run in integer micros (ExactSum) so
  * totals are order-independent and byte-reproducible cross-engine.
  * Share/ppm divisions run in DECIMAL(38,0), the lane DuckDB's
  * HUGEINT mirrors digit-for-digit.
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

  /** TPC-H Q17 shape — correlated scalar subquery, decorrelated:
    * revenue locked in lineitems whose quantity is below 20% of their
    * part's average quantity, per brand. The reference SQL shape is
    * `WHERE l_quantity < (SELECT 0.2*avg(l_quantity) ... same part)`;
    * the Spark-first rewrite is the classic decorrelation — ONE
    * per-part aggregate (count, sum of integral quantities) joined
    * back on the part key — so the "subquery" runs once as a grouped
    * scan, not per outer row. The comparison stays in integers:
    * `q < 0.2 * (sq/n)  ⇔  5*q*n < sq` — no double division, so the
    * boundary (a quantity at exactly a fifth of the average) is
    * decided identically in every engine.
    *
    * Scale: the per-part stats table is |part|-sized (fact/~4 rows) —
    * AQE picks broadcast vs shuffle by its actual size; both joins
    * share the l_partkey key so the fact shuffles once at most.
    */
  def smallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        ExactSum.micros(col("l_extendedprice")).as("price_u"))
    val ps = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
    val brands = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    li.join(ps, "l_partkey")
      .filter(lit(5) * col("q") * col("n") < col("sq"))
      .join(brands, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        ExactSum.microsToDouble(sum(col("price_u"))).as("revenue"))
  }

  /** TPC-H Q18 shape — HAVING-gated fact aggregate joined back to its
    * dimensions: orders whose total quantity exceeds 250 units, with
    * their customer. The aggregate-filter runs FIRST (map-side partial
    * sums compress lineitem to one row per order before the exchange;
    * the `> 250` gate then cuts ~15k orders to ~200) so the order and
    * customer joins see only the qualifying minority — at 100 TB the
    * post-gate side is broadcastable and AQE does exactly that.
    * Quantities are integral; the gate and the emitted totals are
    * exact long sums.
    */
  def bigOrderCustomers(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 250)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("orderdate"), col("o_totalprice"),
        col("total_qty"))
  }

  /** TPC-H Q15 shape — argmax over an aggregate ("the top supplier"):
    * per-supplier revenue over the closing quarter, keeping every
    * supplier tied at the maximum. The max is a 1-row scalar aggregate
    * broadcast back against the same grouped view (computed once —
    * Spark reuses the exchange under ReuseExchange), NOT a
    * single-partition global window, which would serialize all
    * suppliers through one task at scale. The argmax equality compares
    * integer micros, so ties and the winner are engine-independent;
    * only the final emitted revenue returns to double.
    */
  def topSupplierRevenue(s: SparkSession, d: String): DataFrame = {
    val win0 = lit("1998-03-01").cast("timestamp")
    val win1 = lit(Cutoff).cast("timestamp")
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= win0 && col("l_shipdate") < win1)
      .groupBy(col("l_suppkey"))
      .agg(sum(ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("r_u"))
    val mx = rev.agg(max(col("r_u")).as("max_u"))
    rev.join(broadcast(mx), col("r_u") === col("max_u"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        ExactSum.microsToDouble(col("r_u")).as("total_revenue"))
  }

  /** TPC-H Q11 shape — group share-of-total with a global-scalar
    * threshold: suppliers carrying an ABOVE-AVERAGE slice of all
    * lineitem value (`value > total/n_supp` — scale-invariant, unlike
    * a fixed percentage, which empties as the supplier base grows),
    * with their exact share in ppm. The (total, n) scalar is
    * cross-joined (broadcast) against the per-supplier aggregate —
    * never a global window. Share arithmetic never touches doubles:
    * the threshold test and the ppm floor-division run in
    * DECIMAL(38,0) (value_u*1e6 overflows int64 at ~SF10 — the
    * decimal lane is the documented 100 TB path, and DuckDB's HUGEINT
    * lane agrees digit-for-digit).
    */
  def supplierShare(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(ExactSum.micros(col("l_extendedprice"))).as("value_u"),
        count(lit(1)).as("n_items"))
    val tot = rev.agg(sum(col("value_u")).as("total_u"),
      count(lit(1)).as("n_supp"))
    rev.crossJoin(broadcast(tot))
      .filter(expr("CAST(value_u AS DECIMAL(38,0)) * n_supp > CAST(total_u AS DECIMAL(38,0))"))
      .select(col("l_suppkey").as("suppkey"), col("n_items"),
        ExactSum.microsToDouble(col("value_u")).as("value_rev"),
        expr("CAST(CAST(value_u AS DECIMAL(38,0)) * 1000000 div CAST(total_u AS DECIMAL(38,0)) AS BIGINT)")
          .as("share_ppm"))
  }

  /** TPC-H Q4 shape — EXISTS census: per order priority, how many
    * orders have at least one lineitem shipped more than 90 days after
    * the order date. The EXISTS is a LEFT SEMI join (one match ends
    * the probe — no fan-out, no distinct-after-join); the lateness
    * predicate compares integer epoch days on both engines so the
    * 90-day boundary can't drift through timestamp arithmetic.
    * Pre-projecting lineitem to (orderkey, ship_day) keeps the semi
    * join's build side two columns wide.
    */
  def lateOrderCensus(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")).as("ship_day"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("order_day"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("ship_day") > col("order_day") + 90,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
  }

  /** TPC-H Q22 shape — anti join gated by a global scalar: customers
    * with an above-average account balance and NO order since the
    * lapse cutoff ("high-value lapsed accounts"), per market segment.
    * The average threshold never becomes a float: `bal > total/n ⇔
    * bal_u * n > total_u` in integer micros, with the (total_u, n)
    * scalar broadcast. The lapse test is a LEFT ANTI join against the
    * date-filtered orders — the NOT EXISTS dual of
    * semi_join_customers, with the filter pushed to the orders scan
    * so the anti join's build side is the recent minority, not the
    * full fact table.
    */
  private val LapseCutoff = "2000-01-01"

  def lapsedRichCustomers(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        ExactSum.micros(col("c_acctbal")).as("bal_u"))
    val st = cust.agg(sum(col("bal_u")).as("total_u"), count(lit(1)).as("n"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(LapseCutoff).cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(st))
      .filter(col("bal_u") * col("n") > col("total_u"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        ExactSum.microsToDouble(sum(col("bal_u"))).as("total_bal"))
  }

  /** TPC-H Q7 shape — cross-region trade flows: revenue shipped by
    * ASIA-region suppliers to AMERICA-region customers, per
    * (supp_nation, cust_nation, ship_year). The region filters land on
    * the two DIM chains (region⋈nation⋈supplier and
    * region⋈nation⋈customer both shrink to ~1/5 of their table before
    * any fact join), so the keyed fact shuffles (lineitem⋈orders,
    * orders⋈customer) carry only flow-relevant rows — the
    * filter-before-shuffle discipline Q7 exists to test. Cross-ness is
    * structural (disjoint region filters), never a post-join
    * inequality. Revenue runs on the integer-micros lane.
    */
  private val TradeSuppRegion = "ASIA"
  private val TradeCustRegion = "AMERICA"

  private def regionNations(s: SparkSession, d: String, region: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))

  def nationTradeFlows(s: SparkSession, d: String): DataFrame = {
    val supp = Tables.supplier(s, d)
      .join(broadcast(regionNations(s, d, TradeSuppRegion)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(broadcast(regionNations(s, d, TradeCustRegion)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("ship_year"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg(ExactSum.microsToDouble(sum(col("rev_u"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8 shape — national market share: of all ECONOMY-part
    * revenue bought by AMERICA-region customers, what fraction (ppm)
    * was supplied by one nation, per order year. The selective part
    * filter (1/|types|) reaches the part scan and shrinks lineitem
    * BEFORE its join shuffles; region⋈nation⋈customer is a broadcast
    * chain; the share division runs in DECIMAL(38,0) (numerator
    * micros * 1e6 overflows int64 at warehouse scale) mirroring
    * DuckDB's HUGEINT lane digit-for-digit, and both engines floor
    * the division on non-negative integers.
    */
  private val ShareNation = "NATION_3"
  private val SharePartType = "ECONOMY"

  def marketShare(s: SparkSession, d: String): DataFrame = {
    val econParts = Tables.part(s, d)
      .filter(col("p_type") === SharePartType)
      .select(col("p_partkey"))
    val amerNations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(amerNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.nation(s, d)
      .filter(col("n_name") === ShareNation)
      .select(col("n_nationkey").as("target_nk"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(suppNation), col("s_nationkey") === col("target_nk"),
        "left")
      .select(col("s_suppkey"), col("target_nk").isNotNull.as("is_target"))
    val li = Tables.lineitem(s, d)
      .join(econParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("order_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("order_year"))
      .agg(
        sum(when(col("is_target"), col("rev_u")).otherwise(0L)).as("target_u"),
        sum(col("rev_u")).as("total_u"),
        count(lit(1)).as("n_items"))
      .select(col("order_year"), col("n_items"),
        ExactSum.microsToDouble(col("total_u")).as("total_revenue"),
        expr("CAST(CAST(target_u AS DECIMAL(38,0)) * 1000000 div CAST(total_u AS DECIMAL(38,0)) AS BIGINT)")
          .as("share_ppm"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: per-customer
    * order counts (INCLUDING never-ordered customers, via the left
    * outer join with the priority predicate inside the join condition,
    * not a pre-filter that would turn it inner), then the histogram of
    * those counts. Two aggregations, both integer-exact; the second
    * runs over a table bounded by |customers|, and its group key
    * (n_orders) is tiny, so the final exchange is negligible. The
    * fact-side filter is applied before the join shuffle.
    */
  def customerOrderCounts(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** TPC-H Q21 shape — sole-blame late supplier census: suppliers who
    * were the ONLY late shipper (>90 epoch-days after the order date)
    * on a multi-supplier order. Shape: ONE orderkey join shuffle
    * (lineitem⋈orders) feeds everything downstream shuffle-free —
    * the (orderkey, suppkey) dedup-aggregate and the per-order census
    * (count / late-count as a WINDOW over the same orderkey
    * clustering, not a second aggregate branch) both ride the join's
    * HashPartitioning(orderkey), so EnsureRequirements adds no
    * exchange and the fact join is scanned ONCE. (The first draft
    * derived the census by re-aggregating perSupp and joining back —
    * Catalyst planned the whole fact join twice, no exchange reuse;
    * the window form halves the sf1 cost.) Only the final
    * per-supplier rollup re-shuffles, on a table bounded by |blamed
    * (order, supplier) pairs|. Lateness compares integer epoch days
    * on both engines (the late_order_census boundary).
    */
  def waitingSupplierCensus(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")).as("ship_day"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("order_day"))
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("ship_day") > col("order_day") + 90, 1L).otherwise(0L))
        .as("late_any"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .select(col("l_orderkey"), col("l_suppkey"), col("late_any"),
        count(lit(1)).over(w).as("n_supp"),
        sum(col("late_any")).over(w).as("n_late"))
      .filter(col("late_any") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_blamed_orders"))
  }

  /** TPC-H Q10 shape — returned-item revenue: the top 20 customers by
    * revenue lost to returns in a one-quarter order window. The
    * selective filters (returnflag on lineitem, date window on orders)
    * are scan predicates pushed to parquet, so the orderkey join
    * shuffles only the filtered minorities; customer and nation attach
    * AFTER the revenue rollup (the aggregate is custkey-bounded, so
    * the enrichment join carries |customers| rows, not |lineitems|).
    * Top-20 ordering decides on exact integer micros with a custkey
    * tiebreak — engine-independent.
    */
  private val ReturnsQStart = "1998-01-01"
  private val ReturnsQEnd = "1998-04-01"

  def returnedItemRevenue(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(ReturnsQStart).cast("timestamp") &&
        col("o_orderdate") < lit(ReturnsQEnd).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    val perCust = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_u")).as("r_u"), count(lit(1)).as("n_items"))
    perCust
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("n_items"),
        ExactSum.microsToDouble(col("r_u")).as("lost_revenue"), col("r_u"))
      .orderBy(col("r_u").desc, col("c_custkey"))
      .limit(20)
      .drop("r_u")
  }

  /** TPC-H Q12 shape — late-shipment priority census: per return flag,
    * how many late-shipped lineitems (>60 epoch-days after order
    * date) belong to critical-priority orders (1-URGENT / 2-HIGH) vs
    * not — the two-way CONDITIONAL aggregation after a fact join. The
    * classification happens in the aggregate (sum of when), never as
    * two query passes; the join carries only the three columns the
    * census needs. Lateness compares integer epoch days.
    */
  def lateShipmentCensus(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01")).as("ship_day"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("order_day"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("ship_day") > col("order_day") + 60)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("n_critical"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("n_regular"))
  }

  /** TPC-H Q19 shape — disjunctive predicate revenue: revenue from
    * three OR'd brand/size/quantity clause groups. The point is
    * PUSHDOWN of a disjunctive tree: the per-side conjuncts common to
    * all branches (size >= 1, quantity bounds) plus the OR of brands
    * reach the two scans, and the join evaluates only the residual
    * cross-table clauses. One broadcast-able dim join (part after its
    * brand OR-filter is a minority), one aggregate — no union of three
    * query passes.
    */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .groupBy(col("p_brand"))
      .agg(ExactSum.microsToDouble(sum(col("rev_u"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q16 shape — supplier diversity census: how many DISTINCT
    * suppliers ship each (brand, size-bucket) of parts, excluding one
    * brand. The interesting plan property is count(DISTINCT supp)
    * AFTER a fact join: Catalyst plans it as a two-phase aggregate
    * (partial distinct on (group, supp), then count) — never a
    * row-level distinct of the joined stream. The part filter prunes
    * to the scan; lineitem carries only (partkey, suppkey).
    */
  def supplierDiversity(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"),
        (floor(col("p_size") / 10) * 10).cast("long").as("size_bucket"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("size_bucket"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14 shape — promo revenue share by month: what fraction
    * (ppm) of each month's revenue came from ECONOMY-type parts. The
    * conditional-share-of-total shape: ONE pass computes both the
    * numerator (sum of when) and denominator in the same aggregate —
    * never two query passes joined back. Share division runs in
    * DECIMAL(38,0) == DuckDB HUGEINT; month comes from the shipdate.
    */
  def promoShareMonthly(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"),
        ExactSum.micros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_u"))
    val p = Tables.part(s, d)
      .select(col("p_partkey"), (col("p_type") === SharePartType).as("is_promo"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("month"))
      .agg(sum(when(col("is_promo"), col("rev_u")).otherwise(0L)).as("promo_u"),
        sum(col("rev_u")).as("total_u"),
        count(lit(1)).as("n_items"))
      .select(col("month"), col("n_items"),
        ExactSum.microsToDouble(col("total_u")).as("total_revenue"),
        expr("CAST(CAST(promo_u AS DECIMAL(38,0)) * 1000000 div CAST(total_u AS DECIMAL(38,0)) AS BIGINT)")
          .as("promo_ppm"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "star_shipping_priority" -> (shippingPriority _),
    "star_local_volume" -> (localSupplierVolume _),
    "basket_pairs" -> (basketPairs _),
    "bloom_prune_join" -> (bloomPruneJoin _),
    "small_qty_revenue" -> (smallQtyRevenue _),
    "big_order_customers" -> (bigOrderCustomers _),
    "top_supplier_revenue" -> (topSupplierRevenue _),
    "supplier_share" -> (supplierShare _),
    "late_order_census" -> (lateOrderCensus _),
    "lapsed_rich_customers" -> (lapsedRichCustomers _),
    "nation_trade_flows" -> (nationTradeFlows _),
    "market_share" -> (marketShare _),
    "customer_order_counts" -> (customerOrderCounts _),
    "waiting_supplier_census" -> (waitingSupplierCensus _),
    "returned_item_revenue" -> (returnedItemRevenue _),
    "late_shipment_census" -> (lateShipmentCensus _),
    "disjunctive_revenue" -> (disjunctiveRevenue _),
    "supplier_diversity" -> (supplierDiversity _),
    "promo_share_monthly" -> (promoShareMonthly _)
  )

  val oracleSql: Map[String, String] = Map(
    "star_shipping_priority" ->
      s"""SELECT o_orderkey, o_orderdate::DATE AS orderdate, o_orderpriority,
         | CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue
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
         | CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue,
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

    // integer-exact correlated-subquery twin: 5*q*n < sq == q < 0.2*avg
    "small_qty_revenue" ->
      """WITH ps AS (
        | SELECT l_partkey, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        | FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_items,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN ps USING (l_partkey)
        | JOIN part ON p_partkey = l_partkey
        |WHERE 5 * CAST(l_quantity AS BIGINT) * n < sq
        |GROUP BY 1""".stripMargin,

    "big_order_customers" ->
      """WITH big AS (
        | SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        | FROM lineitem GROUP BY 1
        | HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate::DATE AS orderdate,
        | o_totalprice, total_qty
        |FROM big
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON c_custkey = o_custkey""".stripMargin,

    // argmax ties decided on integer micros (r_u); revenue emitted via
    // the proven decimal-sum lane
    "top_supplier_revenue" ->
      s"""WITH rev AS (
         | SELECT l_suppkey,
         |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS r_u,
         |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS total_revenue
         | FROM lineitem
         | WHERE l_shipdate >= TIMESTAMP '1998-03-01'
         |  AND l_shipdate < TIMESTAMP '$Cutoff'
         | GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE r_u = (SELECT max(r_u) FROM rev)""".stripMargin,

    // HUGEINT lane mirrors Spark's DECIMAL(38,0) lane digit-for-digit;
    // both floor the ppm division on positive integers
    "supplier_share" ->
      """WITH rev AS (
        | SELECT l_suppkey AS suppkey, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS value_u,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS value_rev
        | FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(value_u) AS HUGEINT) AS total_u,
        |  CAST(count(*) AS BIGINT) AS n_supp FROM rev)
        |SELECT suppkey, n_items, value_rev,
        | CAST((CAST(value_u AS HUGEINT) * 1000000) // total_u AS BIGINT) AS share_ppm
        |FROM rev, tot
        |WHERE CAST(value_u AS HUGEINT) * n_supp > total_u""".stripMargin,

    // integer epoch-day lateness boundary; EXISTS == semi join
    "late_order_census" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (
        | SELECT 1 FROM lineitem
        | WHERE l_orderkey = o_orderkey
        |  AND date_diff('day', DATE '1970-01-01', l_shipdate::DATE)
        |    > date_diff('day', DATE '1970-01-01', o_orderdate::DATE) + 90)
        |GROUP BY 1""".stripMargin,

    // integer-micros mean threshold (bal_u*n > total_u); NOT EXISTS ==
    // anti join against the date-filtered orders
    "lapsed_rich_customers" ->
      s"""WITH c AS (
         | SELECT c_custkey, c_mktsegment, c_acctbal,
         |  CAST(round(c_acctbal * 1000000) AS BIGINT) AS bal_u
         | FROM customer),
         |st AS (
         | SELECT CAST(sum(bal_u) AS BIGINT) AS total_u,
         |  CAST(count(*) AS BIGINT) AS n
         | FROM c)
         |SELECT c_mktsegment, count(*) AS n_custs,
         | CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS total_bal
         |FROM c, st
         |WHERE bal_u * n > total_u
         | AND NOT EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey
         |   AND o_orderdate >= TIMESTAMP '$LapseCutoff')
         |GROUP BY 1""".stripMargin,

    // disjoint region filters on the two dim chains; year cast to
    // BIGINT on both sides; decimal-sum revenue lane
    "nation_trade_flows" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         | CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         | CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue,
         | count(*) AS n_items
         |FROM lineitem
         | JOIN supplier ON s_suppkey = l_suppkey
         | JOIN nation ns ON ns.n_nationkey = s_nationkey
         | JOIN region rs ON rs.r_regionkey = ns.n_regionkey
         | JOIN orders ON o_orderkey = l_orderkey
         | JOIN customer ON c_custkey = o_custkey
         | JOIN nation nc ON nc.n_nationkey = c_nationkey
         | JOIN region rc ON rc.r_regionkey = nc.n_regionkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         | AND l_shipdate < TIMESTAMP '1998-01-01'
         | AND rs.r_name = '$TradeSuppRegion'
         | AND rc.r_name = '$TradeCustRegion'
         |GROUP BY 1, 2, 3""".stripMargin,

    // HUGEINT numerator/denominator lane == Spark's DECIMAL(38,0);
    // both floor the ppm division on non-negative integers
    "market_share" ->
      s"""WITH li AS (
         | SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT) AS rev_u,
         |  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)) AS rev_d,
         |  (SELECT n_nationkey FROM nation WHERE n_name = '$ShareNation')
         |    = s_nationkey AS is_target
         | FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation nc ON nc.n_nationkey = c_nationkey
         |  JOIN region ON r_regionkey = nc.n_regionkey
         | WHERE p_type = '$SharePartType' AND r_name = 'AMERICA')
         |SELECT order_year, count(*) AS n_items,
         | CAST(CAST(sum(rev_d) AS VARCHAR) AS DOUBLE) AS total_revenue,
         | CAST((CAST(sum(CASE WHEN is_target THEN rev_u ELSE 0 END) AS HUGEINT) * 1000000)
         |   // CAST(sum(rev_u) AS HUGEINT) AS BIGINT) AS share_ppm
         |FROM li GROUP BY 1""".stripMargin,

    // left join keeps zero-order customers; the priority predicate
    // lives in the JOIN condition so it cannot turn the join inner
    "customer_order_counts" ->
      """WITH per_cust AS (
        | SELECT c_custkey, count(o_orderkey) AS n_orders
        | FROM customer LEFT JOIN orders
        |  ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY 1)
        |SELECT n_orders, count(*) AS n_customers
        |FROM per_cust GROUP BY 1""".stripMargin,

    // integer epoch-day lateness; n_late/n_supp never reach the output
    // (HUGEINT-safe); the blame join replays the Spark composition
    "waiting_supplier_census" ->
      """WITH ls AS (
        | SELECT l_orderkey, l_suppkey,
        |  max(CASE WHEN date_diff('day', DATE '1970-01-01', l_shipdate::DATE)
        |        > date_diff('day', DATE '1970-01-01', o_orderdate::DATE) + 90
        |      THEN 1 ELSE 0 END) AS late_any
        | FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        | GROUP BY 1, 2),
        |po AS (
        | SELECT l_orderkey FROM ls GROUP BY 1
        | HAVING count(*) >= 2 AND sum(late_any) = 1)
        |SELECT s_suppkey, s_name, count(*) AS n_blamed_orders
        |FROM ls
        | JOIN po USING (l_orderkey)
        | JOIN supplier ON s_suppkey = l_suppkey
        |WHERE late_any = 1
        |GROUP BY 1, 2""".stripMargin,

    // top-20 decided on the integer-micros sum with custkey tiebreak;
    // revenue emitted through the proven decimal-sum lane
    "returned_item_revenue" ->
      s"""WITH per_cust AS (
         | SELECT o_custkey,
         |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS r_u,
         |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS lost_revenue,
         |  count(*) AS n_items
         | FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         | WHERE o_orderdate >= TIMESTAMP '$ReturnsQStart'
         |  AND o_orderdate < TIMESTAMP '$ReturnsQEnd'
         |  AND l_returnflag = 'R'
         | GROUP BY 1)
         |SELECT c_custkey, c_name, n_name, n_items, lost_revenue
         |FROM per_cust
         | JOIN customer ON c_custkey = o_custkey
         | JOIN nation ON n_nationkey = c_nationkey
         |ORDER BY r_u DESC, c_custkey
         |LIMIT 20""".stripMargin,

    // two-way conditional aggregation; integer epoch-day lateness
    "late_shipment_census" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_critical,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS n_regular
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE date_diff('day', DATE '1970-01-01', l_shipdate::DATE)
        |  > date_diff('day', DATE '1970-01-01', o_orderdate::DATE) + 60
        |GROUP BY 1""".stripMargin,

    // the disjunctive clause tree evaluated post-join, identical
    // branch boundaries; decimal-sum revenue lane
    "disjunctive_revenue" ->
      """SELECT p_brand,
        | CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity >= 1 AND l_quantity <= 30
        | AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |        AND l_quantity BETWEEN 20 AND 30))
        |GROUP BY 1""".stripMargin,

    // count(DISTINCT) after the join; integer size buckets
    "supplier_diversity" ->
      """SELECT p_brand,
        | CAST(floor(p_size / 10) * 10 AS BIGINT) AS size_bucket,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY 1, 2""".stripMargin,

    // HUGEINT share lane == Spark DECIMAL(38,0); decimal-sum revenue
    "promo_share_monthly" ->
      s"""SELECT date_trunc('month', l_shipdate)::DATE AS month,
         | count(*) AS n_items,
         | CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS total_revenue,
         | CAST((CAST(sum(CASE WHEN p_type = '$SharePartType'
         |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)
         |    ELSE 0 END) AS HUGEINT) * 1000000)
         |  // CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS HUGEINT)
         |  AS BIGINT) AS promo_ppm
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         | AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1""".stripMargin,

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
