package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The three partsupp-gated TPC-H join disciplines (Q2 correlated
  * min-cost supplier, Q9 multi-fact profit rollup, Q20 nested
  * semi-join with a scalar threshold) that VERDICT r6 listed as the
  * last classic join shapes absent from the registry because the
  * driver corpus ships no partsupp table.
  *
  * partsupp is SYNTHESIZED deterministically from the corpus itself:
  * the distinct (l_partkey, l_suppkey) pairs observed in lineitem,
  * with availqty/supplycost derived from the two keys by pure integer
  * arithmetic. That construction is the one a catalog would satisfy
  * (every lineitem references a supply contract — the same closure
  * property TPC-H's generator enforces), it is computable identically
  * in Spark and DuckDB (the oracle carries the same CTE, so the gate
  * stays strict hash-equality), and it is scale-stable: the pair
  * census is one map-side-combined aggregation of the fact table,
  * |partsupp| <= |lineitem|, and the derived columns are per-row
  * expressions.
  *
  * Exactness: supplycost lives in integer CENTS, quantities are
  * integral (cast long), and money exits follow the repo-wide lane
  * rule — sum an integer-scaled long, shift the scale back in DECIMAL
  * once per group, one final nearest-double rounding (see
  * functions/ExactSum.scala; the Q9 lane is 1e4 because revenue sits
  * on the 4 dp price x discount lattice).
  */
object PartSupp {

  /** Catalog synthesis: one row per observed (part, supplier) pair.
    * availqty in 1..100, supplycost in 1000..99999 cents — both pure
    * functions of the keys so any engine regenerates them bit-equal.
    *
    * The ORACLE keeps this catalog as a CTE and replays the textbook
    * join plans below. The Spark side exploits what the optimizer
    * cannot know (guide §8 — problem knowledge): because the catalog
    * is the distinct pair census OF LINEITEM ITSELF with derived
    * columns that are pure key functions, any join of a
    * lineitem-derived table against it on (partkey, suppkey) is a 1:1
    * identity attach — so product_profit / excess_inventory inline the
    * derived columns instead of paying the corpus-wide distinct + the
    * composite-key join exchange, and min_cost_supplier scopes the
    * pair census with its broadcast dimension filters BEFORE the
    * distinct. All three remain strict-hash-equal to the join-form
    * oracle.
    */
  private val PartsuppCte =
    """partsupp AS (
      | SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |  (l_partkey * 31 + l_suppkey * 17) % 100 + 1 AS ps_availqty,
      |  (l_partkey * 53 + l_suppkey * 29) % 99000 + 1000 AS ps_supplycost_cents
      | FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))""".stripMargin

  /** Suppliers of one region, with nation name — a <=|supplier|-row
    * dimension (broadcast side at every scale; region/nation are
    * fixed-size and supplier grows like sqrt of the fact tables).
    */
  private def regionSuppliers(s: SparkSession, d: String, region: String): DataFrame =
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))

  /** TPC-H Q2 shape — correlated min-cost supplier, decorrelated: for
    * each SMALL/size<10 part, the cheapest EUROPE supplier carrying
    * it (ties -> lowest suppkey; cost is integer cents so the min and
    * the tie are engine-exact). The correlated subquery
    * `WHERE ps_supplycost = (SELECT min(...) same part)` becomes ONE
    * grouped min over the region-scoped catalog joined back on
    * (part, cost) — the subquery runs once as an aggregate, never per
    * outer row. Join order: the part filter (pushed to the parquet
    * scan) and the region-supplier dimension both prune partsupp
    * BEFORE its aggregation, so the grouped min runs over the scoped
    * minority; all dimension joins are broadcasts, the partsupp
    * self-rejoin shares the ps_partkey key.
    */
  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    val scopedParts = Tables.part(s, d)
      .filter(col("p_size") < 10 && col("p_type") === "SMALL")
      .select(col("p_partkey"), col("p_name"))
    val rs = regionSuppliers(s, d, "EUROPE")
    // Scope the catalog BEFORE the distinct (guide §2.3 — shuffle fewer
    // bytes): both scopes are broadcast semi-joins on the distinct key
    // itself (p_partkey / s_suppkey are PKs of their dimensions, so the
    // inner joins neither drop nor duplicate pairs differently than the
    // post-distinct joins did), so distinct(σ(pairs)) == σ(distinct(
    // pairs)) and the distinct exchange carries only the SMALL x EUROPE
    // minority instead of every observed (part, supplier) pair. The
    // derived ps_* columns stay pure key functions, computed after.
    val scoped = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(scopedParts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(rs.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_supplycost_cents",
        (col("ps_partkey") * 53 + col("ps_suppkey") * 29) % 99000 + 1000)
    // the correlated min + tie-break is ONE lexicographic struct-min
    // aggregate (min cost first, then min suppkey among cost ties —
    // exactly the old grouped-min + equality re-join + min(suppkey)
    // composition), so the census is consumed once and the self-rejoin
    // (two SortMergeJoins at spec scale) disappears (guide §2.4).
    scoped
      .join(broadcast(scopedParts), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("ps_partkey").as("p_partkey"), col("p_name"))
      .agg(min(struct(col("ps_supplycost_cents"), col("ps_suppkey"))).as("b"))
      .select(col("p_partkey"), col("p_name"),
        col("b.ps_supplycost_cents").as("min_cost_cents"),
        col("b.ps_suppkey").as("s_suppkey"))
      .join(broadcast(rs), Seq("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("min_cost_cents"),
        col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** TPC-H Q9 shape — multi-fact profit rollup: for '%red%' parts,
    * sum(revenue - supplycost x qty) by supplier nation x order year.
    * The two facts (lineitem, partsupp) join on the composite
    * (partkey, suppkey) — both sides scale with the data so this is
    * the one keyed shuffle; part ('%red%', pushed to the scan),
    * supplier, nation, and orders' year column all hang off it as
    * broadcasts or a second keyed join (orders on orderkey). Profit
    * runs in an integer 1e4 lane: revenue = round(price x (1-disc) x
    * 1e4) (exact on the 4 dp lattice), cost = cents x qty x 100 —
    * the sum is an order-independent long, one decimal shift at the
    * exit.
    */
  def productProfit(s: SparkSession, d: String): DataFrame = {
    val redParts = Tables.part(s, d)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long").as("rev_e4"),
        col("l_quantity").cast("long").as("qty"))
    val suppNation = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    // partsupp is the distinct (partkey, suppkey) census of lineitem
    // itself, so EVERY lineitem row matches exactly one partsupp row
    // (inner 1:1 by construction) and ps_supplycost_cents is a pure
    // function of the two keys — the fact-fact join is the identity.
    // Inline the derivation instead (guide §2.4 — remove the shuffle
    // outright): this deletes the corpus-wide distinct AND the
    // composite-key join exchange from the plan. Output provably
    // identical; the oracle still replays the join form.
    li.withColumn("ps_supplycost_cents",
        (col("l_partkey") * 53 + col("l_suppkey") * 29) % 99000 + 1000)
      .join(Tables.orders(s, d).select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev_e4") - col("ps_supplycost_cents") * col("qty") * 100)
          .as("profit_e4"))
      .select(col("n_name"), col("o_year"), col("n_items"),
        (col("profit_e4").cast("decimal(38,4)") / lit(10000))
          .cast("double").as("profit"))
  }

  /** TPC-H Q20 shape — nested semi-join with a scalar threshold:
    * ASIA suppliers holding excess inventory of 'small%' parts —
    * availqty > half the quantity they shipped of that part in 1997.
    * The inner aggregate (1997 shipment sums at (part, supplier)
    * grain) is a map-side-combined rollup of the filtered fact; the
    * threshold compare stays in integers (2 x avail > sumq decides
    * the boundary identically in every engine); the part-name scope
    * prunes BOTH fact-grain sides before their composite-key join;
    * the final step is a distinct-suppkey semi-join into the supplier
    * dimension. At 100 TB each step is either a broadcast of a
    * dimension or an equi-join on (partkey, suppkey) — no shape
    * changes with scale.
    */
  def excessInventory(s: SparkSession, d: String): DataFrame = {
    val smallParts = Tables.part(s, d)
      .filter(col("p_name").like("small%"))
      .select(col("p_partkey"))
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sumq"))
    // shipped's (partkey, suppkey) pairs are a subset of partsupp's
    // (both derive from lineitem) and ps_availqty is a pure function of
    // the keys, so the composite-key join is an identity 1:1 attach —
    // inline it (guide §2.4): removes the corpus-wide distinct and the
    // fact-fact join exchange. Output provably identical; the oracle
    // still replays the join form.
    val excess = shipped
      .withColumn("ps_availqty",
        (col("l_partkey") * 31 + col("l_suppkey") * 17) % 100 + 1)
      .filter(lit(2) * col("ps_availqty") > col("sumq"))
      .select(col("l_suppkey").as("ps_suppkey")).distinct()
    excess.join(broadcast(regionSuppliers(s, d, "ASIA")),
        col("ps_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  val queries: Map[String, Relational.Q] = Map(
    "min_cost_supplier" -> (minCostSupplier _),
    "product_profit" -> (productProfit _),
    "excess_inventory" -> (excessInventory _)
  )

  val oracleSql: Map[String, String] = Map(
    "min_cost_supplier" ->
      s"""WITH $PartsuppCte,
         |rsupp AS (
         | SELECT s_suppkey, s_name, n_name
         | FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
         |scoped AS (
         | SELECT ps_partkey, p_name, ps_supplycost_cents, ps_suppkey,
         |  s_name, n_name
         | FROM partsupp
         |  JOIN rsupp ON ps_suppkey = s_suppkey
         |  JOIN part ON ps_partkey = p_partkey
         | WHERE p_size < 10 AND p_type = 'SMALL'),
         |mc AS (
         | SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost_cents
         | FROM scoped GROUP BY 1),
         |best AS (
         | SELECT sc.ps_partkey AS p_partkey, sc.p_name, mc.min_cost_cents,
         |  min(sc.ps_suppkey) AS s_suppkey
         | FROM scoped sc
         |  JOIN mc ON sc.ps_partkey = mc.ps_partkey
         |   AND sc.ps_supplycost_cents = mc.min_cost_cents
         | GROUP BY 1, 2, 3)
         |SELECT p_partkey, p_name, min_cost_cents,
         | best.s_suppkey, rsupp.s_name, rsupp.n_name
         |FROM best JOIN rsupp ON best.s_suppkey = rsupp.s_suppkey""".stripMargin,

    "product_profit" ->
      s"""WITH $PartsuppCte
         |SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         | CAST(count(*) AS BIGINT) AS n_items,
         | CAST(CAST(CAST(sum(
         |   CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
         |   - ps_supplycost_cents * CAST(l_quantity AS BIGINT) * 100
         |  ) AS DECIMAL(38,4)) / 10000 AS VARCHAR) AS DOUBLE) AS profit
         |FROM lineitem
         | JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         | JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2""".stripMargin,

    "excess_inventory" ->
      s"""WITH $PartsuppCte,
         |shipped AS (
         | SELECT l_partkey, l_suppkey,
         |  sum(CAST(l_quantity AS BIGINT)) AS sumq
         | FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
         | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         | GROUP BY 1, 2),
         |excess AS (
         | SELECT DISTINCT ps_suppkey
         | FROM partsupp
         |  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         | WHERE 2 * ps_availqty > sumq)
         |SELECT s_suppkey, s_name, n_name
         |FROM excess
         | JOIN supplier ON ps_suppkey = s_suppkey
         | JOIN nation ON s_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'""".stripMargin
  )
}
