package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-granularity aggregation: ROLLUP subtotals and PIVOT
  * reshaping. Both are single-pass shapes — Spark expands grouping
  * sets inside ONE aggregate (Expand + partial agg before the
  * shuffle), which is the scalable alternative to unioning one
  * groupBy per granularity and re-reading the fact table N times.
  * Sums use the decimal-cast pattern (see q1_agg) so subtotal values
  * are order-independent and exactly reproducible cross-engine.
  */
object MultiDim {

  /** Revenue subtotals at (returnflag, linestatus), (returnflag), and
    * grand-total granularity in one pass. Null grouping keys from the
    * rollup are folded to 'ALL' — the source columns are never null,
    * so the sentinel is unambiguous and the oracle compare stays
    * engine-independent.
    */
  def rollupRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // scale to integer micros BEFORE the rollup: Expand replicates
      // each row once per grouping set, so a conversion inside agg()
      // runs 3x per input row — pre-projected, the double->micros
      // rounding runs once and Expand copies primitive longs. The
      // long-micros sum is byte-equal to the decimal(18,6) sum it
      // replaces (ExactSum scaladoc + ExactSumSpec).
      .select(col("l_returnflag"), col("l_linestatus"),
        graft.functions.ExactSum.micros(col("l_quantity")).as("qty_u"),
        graft.functions.ExactSum.micros(
          col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_u"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        graft.functions.ExactSum.microsToDouble(sum(col("qty_u"))).as("sum_qty"),
        graft.functions.ExactSum.microsToDouble(sum(col("rev_u"))).as("revenue"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("revenue"), col("n"))

  /** CUBE over (priority, status): all four granularities — both
    * margins, the full cross, and the grand total — in ONE pass
    * (Expand ×4 before a single keyed aggregation), completing the
    * grouping-sets family next to ROLLUP (hierarchical subtotals) and
    * PIVOT (wide reshape). Same pre-projected integer-micros
    * discipline as rollupRevenue: Expand copies primitive longs, and
    * the totals are order-independent, so the oracle compare is exact.
    */
  def cubeRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        graft.functions.ExactSum.micros(col("o_totalprice")).as("tp_u"))
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        graft.functions.ExactSum.microsToDouble(sum(col("tp_u"))).as("total_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("total_price"), col("n"))

  /** Order counts and decimal-exact totals pivoted by order status —
    * the wide reshape (one column set per status value). Pivot values
    * are pinned explicitly: at 100 TB an unpinned pivot first runs a
    * distinct scan to discover them, and an unexpected new value
    * silently widens the schema.
    */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(graft.functions.ExactSum.sumExact(col("o_totalprice")))
      .select(col("priority"), col("O").as("total_o"),
        col("F").as("total_f"), col("P").as("total_p"))

  /** Two-phase salted aggregation over the 5-value (maximally skewed)
    * event_type key: partial agg on (key, salt16), final agg on key.
    * AQE cannot split a skewed HASH AGGREGATE (its skew handling is
    * join-only), so this is the explicit pattern for hot groupBy keys
    * at scale. The salt derives from stable row content (never rand():
    * retries/replays must agree) and only shapes the shuffle — results
    * are engine-independent, so the oracle is the plain GROUP BY.
    */
  def saltedEventAgg(s: SparkSession, d: String): DataFrame =
    graft.functions.Salting.saltedAgg(
      Tables.events(s, d), "event_type", "event_id", 16)(
      ("__salt", Seq(count(lit(1)).as("pn"), sum(col("value")).as("ps"))),
      Seq(sum(col("pn")).as("n"), round(sum(col("ps")), 4).as("sum_value")))

  /** Decile assignment over document length (ntile) + per-decile
    * stats — the equal-frequency binning step of a length-balanced
    * training mix. One global-order window; the deterministic
    * (n_chars, doc_id) tiebreak keeps tile membership engine-
    * independent. A single-partition global sort is the honest cost
    * of exact ntile; approximate at 100 TB with percentile cuts.
    */
  def ntileBands(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
  }

  /** Customers with no orders since 1998 (inactive customers) — the
    * anti-join tier: one keyed shuffle, the date filter pushed to the
    * orders scan BEFORE the join (Spark builds a hash anti join,
    * never a NOT IN re-scan).
    */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "1998-01-01")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** The EXISTS dual of customersWithoutOrders: customers holding at
    * least one URGENT pre-1997 order, as a LEFT SEMI join — one keyed
    * probe that emits each left row at most once and carries ZERO
    * right-side columns through the shuffle (an inner join +
    * distinct would haul the order rows across and need a second
    * dedup shuffle). Filter sits below the join on the probe side.
    */
  def customersWithUrgentOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") < "1997-01-01")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Exact interpolated quartiles of quantity per returnflag: one
    * percentile aggregate evaluating all three cut points in a single
    * buffer pass, exploded to (flag, q, value) rows so the oracle
    * compare stays scalar. Exact percentile buffers per group —
    * bounded here; the 100 TB form is approx_percentile with a fixed
    * error budget.
    */
  def groupQuantiles(s: SparkSession, d: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_quantity, array(${qs.mkString(", ")}))").as("vals"))
      .select(col("l_returnflag"), posexplode(col("vals")).as(Seq("qi", "v")))
      .select(col("l_returnflag"),
        element_at(typedlit(qs), col("qi") + 1).as("q"),
        round(col("v"), 6).as("quantile_val"))
  }

  /** Winsorized outlier capping: clamp every price into its return-
    * flag group's [p05, p95] band — the robust-statistics cleaning
    * step before averaging noisy numerics. Two passes: a bounded
    * per-group percentile aggregate (3 groups — broadcast back), then
    * a scan-speed clamp. Both engines round the interpolated bounds
    * to 6 dp BEFORE clamping: prices live on a 2-dp lattice, so a
    * price can only equal a rounded bound when the bound is itself
    * lattice-valued, where clamp-at-equality is the identity in
    * either engine — no ulp-boundary flips.
    */
  def winsorizePrices(s: SparkSession, d: String): DataFrame = {
    val caps = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.05)"), 6).as("lo"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("hi"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"))
      .join(broadcast(caps), Seq("l_returnflag"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"),
        greatest(least(col("l_extendedprice"), col("hi")), col("lo"))
          .as("capped_price"),
        (col("l_extendedprice") < col("lo") ||
          col("l_extendedprice") > col("hi")).as("is_capped"))
  }

  /** MAD-based robust outlier flags — the heavy-tail-safe twin of
    * winsorizePrices, over the heavy-tailed events.value (per-type
    * max |x−med|/MAD runs 12–18x here; lineitem prices are uniform
    * and never trip a MAD gate): per-type exact median, then the
    * median absolute deviation, then the standard
    * |x - med| > 3 * 1.4826 * MAD flag (1.4826 ~ 1/Phi^-1(0.75)
    * rescales MAD to sigma under normality; the product is written as
    * the single literal 4.4478 so both engines compare against the
    * identical double). Two group-scoped exact-percentile aggs (the
    * honest cross-engine-checkable form; the 100 TB swap is
    * approx_percentile, bound-pinned in SketchSpec) and two broadcast
    * joins of 5-row stats tables — the event stream never shuffles.
    */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = base.groupBy(col("event_type"))
      .agg(round(median(col("value")), 6).as("med"))
    val dev = base.join(broadcast(med), Seq("event_type"))
    val mad = dev
      .groupBy(col("event_type"))
      .agg(round(median(abs(col("value") - col("med"))), 6).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"),
        (abs(col("value") - col("med")) > lit(4.4478) * col("mad"))
          .cast("long").as("is_outlier"))
  }

  /** Distribution position of every document in its source's length
    * distribution: percent_rank + cume_dist over a unique
    * (n_chars, doc_id) order — the per-stratum CDF features a
    * length-balanced sampler consumes. One window shuffle on source.
    */
  def lengthDistribution(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** Skyline (Pareto frontier) over part: the parts no other part
    * dominates under (minimize retail price, maximize size) — "is any
    * part both cheaper AND at-least-as-big (or as-cheap AND strictly
    * bigger)?" — the classic multi-criteria catalog query (Börzsönyi
    * et al., ICDE 2001).
    *
    * Shape: NOT the textbook quadratic NOT-EXISTS self-join (O(n²) row
    * pairs — unrunnable at 100 TB). With one discrete criterion the
    * skyline factors through the per-size price minimum: a part
    * survives iff it HOLDS its size's best price AND that price
    * strictly beats the best price of every STRICTLY larger size. So:
    * one map-side-combining groupBy collapses the corpus to <= |sizes|
    * rows (50 here), a running-min window over that BOUNDED table
    * (descending size) computes "best above", and the surviving
    * (size, price) frontier — at most |sizes| rows — broadcasts back
    * to fetch every tied part in one scan. Corpus-sized data crosses
    * exactly two exchanges: the groupBy partial-agg and the frontier
    * probe's scan. Ties on (size, best price) are NOT mutually
    * dominating (no strict criterion) and all survive — the join-back
    * keeps them, where a row_number pick would silently drop rows.
    * Prices compare in exact cents (round to long): a raw double
    * `<` at the frontier boundary would be one-ulp fragile.
    */
  def skylineFrontier(s: SparkSession, d: String): DataFrame =
    skyline(Tables.part(s, d))

  /** Skyline core over any frame with (p_partkey, p_name, p_size,
    * p_retailprice) — unit-tested on hand frames with dominated rows,
    * frontier ties, and a single-size corpus (SkylineSpec).
    */
  private[operators] def skyline(part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = part.select(col("p_partkey"), col("p_name"),
      col("p_size"), col("p_retailprice"),
      round(col("p_retailprice") * 100).cast("long").as("pc"))
    val best = p.groupBy(col("p_size")).agg(min(col("pc")).as("best"))
    // partition-less window over the post-aggregate <=50-row size
    // table, never the corpus (the Temporal.scala:206 discipline)
    val w = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best
      .withColumn("above", min(col("best")).over(w))
      .filter(col("above").isNull || col("best") < col("above"))
      .select(col("p_size").as("f_size"), col("best"))
    p.join(broadcast(frontier),
        col("p_size") === col("f_size") && col("pc") === col("best"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("p_retailprice"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "skyline_frontier" -> (skylineFrontier _),
    "length_distribution" -> (lengthDistribution _),
    "group_quantiles" -> (groupQuantiles _),
    "winsorize_prices" -> (winsorizePrices _),
    "mad_outliers" -> (madOutliers _),
    "rollup_revenue" -> (rollupRevenue _),
    "cube_revenue" -> (cubeRevenue _),
    "pivot_status" -> (pivotStatus _),
    "salted_event_agg" -> (saltedEventAgg _),
    "ntile_bands" -> (ntileBands _),
    "anti_join_customers" -> (customersWithoutOrders _),
    "semi_join_customers" -> (customersWithUrgentOrders _)
  )

  // DECIMAL -> VARCHAR -> DOUBLE everywhere a summed decimal leaves
  // the oracle as a double: DuckDB's direct DECIMAL->DOUBLE cast
  // double-rounds (int128 -> double, then / 10^scale — two IEEE
  // roundings), while Spark's Decimal.toDouble correctly rounds once.
  // At sf1 magnitudes (~1e11, ulp 1.5e-5) the two paths landed one ulp
  // apart on rollup_revenue's 'A' subtotal; the string route uses
  // DuckDB's correctly-rounded fast_float parse, matching Spark
  // bit-for-bit at any magnitude.
  val oracleSql: Map[String, String] = Map(
    // independent formulation: dominance NOT EXISTS — but over the
    // BOUNDED per-size frontier, not the raw quadratic self-join (the
    // same-size part of dominance is already folded into `best`)
    "skyline_frontier" ->
      """WITH p AS (
        | SELECT p_partkey, p_name, p_size, p_retailprice,
        |        CAST(round(p_retailprice * 100) AS BIGINT) AS pc
        | FROM part),
        |best AS (SELECT p_size, min(pc) AS best FROM p GROUP BY 1)
        |SELECT t.p_partkey, t.p_name, t.p_size, t.p_retailprice
        |FROM p t JOIN best b ON t.p_size = b.p_size AND t.pc = b.best
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM best u WHERE u.p_size > t.p_size AND u.best <= t.pc)""".stripMargin,

    "rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "cube_revenue" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        | coalesce(o_orderstatus, 'ALL') AS status,
        | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS total_price,
        | count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,

    "pivot_status" ->
      """SELECT o_orderpriority AS priority,
        | CAST(CAST(sum(CASE WHEN o_orderstatus = 'O'
        |   THEN CAST(o_totalprice AS DECIMAL(20,6)) END) AS VARCHAR) AS DOUBLE) AS total_o,
        | CAST(CAST(sum(CASE WHEN o_orderstatus = 'F'
        |   THEN CAST(o_totalprice AS DECIMAL(20,6)) END) AS VARCHAR) AS DOUBLE) AS total_f,
        | CAST(CAST(sum(CASE WHEN o_orderstatus = 'P'
        |   THEN CAST(o_totalprice AS DECIMAL(20,6)) END) AS VARCHAR) AS DOUBLE) AS total_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "salted_event_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "length_distribution" ->
      """SELECT doc_id, source, n_chars,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)""".stripMargin,

    "group_quantiles" ->
      """SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS q,
        | round(quantile_cont(l_quantity, 0.25), 6) AS quantile_val
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS q,
        | round(quantile_cont(l_quantity, 0.5), 6) AS quantile_val
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, CAST(0.75 AS DOUBLE) AS q,
        | round(quantile_cont(l_quantity, 0.75), 6) AS quantile_val
        |FROM lineitem GROUP BY 1""".stripMargin,

    "mad_outliers" ->
      """WITH med AS (
        | SELECT event_type, round(median(value), 6) AS med
        | FROM events GROUP BY 1),
        |dev AS (
        | SELECT e.event_id, e.event_type, e.value, med.med
        | FROM events e JOIN med USING (event_type)),
        |mad AS (
        | SELECT event_type, round(median(abs(value - med)), 6) AS mad
        | FROM dev GROUP BY 1)
        |SELECT dev.event_id, dev.event_type, dev.value, dev.med, mad.mad,
        | CAST(CASE WHEN abs(dev.value - dev.med) > 4.4478 * mad.mad
        |  THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM dev JOIN mad USING (event_type)""".stripMargin,

    "winsorize_prices" ->
      """WITH caps AS (
        | SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
        | FROM lineitem GROUP BY 1)
        |SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
        | greatest(least(l_extendedprice, hi), lo) AS capped_price,
        | (l_extendedprice < lo OR l_extendedprice > hi) AS is_capped
        |FROM lineitem JOIN caps USING (l_returnflag)""".stripMargin,

    "ntile_bands" ->
      """WITH t AS (
        | SELECT doc_id, n_chars,
        |  ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        | FROM documents)
        |SELECT decile, count(*) AS n, min(n_chars) AS min_chars,
        | max(n_chars) AS max_chars
        |FROM t GROUP BY decile""".stripMargin,

    "anti_join_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= '1998-01-01')""".stripMargin,

    "semi_join_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        |   AND o_orderdate < '1997-01-01')""".stripMargin
  )
}
