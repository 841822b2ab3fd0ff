package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Cleaning._

/** Composite queries exercising the reference's full analytical shape
  * (SURVEY.md §3.2) as ONE oracle-checked plan: dimension-enriched
  * panel -> per-entity lag deltas -> within-cohort ranks -> synthetic
  * cross-section rows. This is the flagship `entry` shape, made
  * verifiable against DuckDB.
  */
object Composite {

  /** Panel analytics: weekly revenue by nation; per-nation 1-week lag
    * delta; weekly revenue rank; appended ALL-mean synthetic rows.
    */
  def panelPipeline(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)

    val panel = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), weekofyear(col("o_orderdate")).cast("long").as("week"))
      .agg(graft.functions.ExactSum.sumExact(
        col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue")) // exact long-micros sum: see ExactSum scaladoc

    val wLag = Window.partitionBy("nation").orderBy("week")
    val wRank = Window.partitionBy("week").orderBy(col("revenue").desc, col("nation"))
    val ranked = panel.select(
      col("nation"), col("week"), col("revenue"),
      round(col("revenue") - lag(col("revenue"), 1).over(wLag), 4).as("revenue_1wk_abs"),
      rank().over(wRank).cast("long").as("revenue_rank"))

    val stats = ranked.groupBy(col("week"))
      .agg(round(avg(col("revenue")), 4).as("revenue"))
      .select(lit("ALL-mean").as("nation"), col("week"), col("revenue"),
        lit(null).cast("double").as("revenue_1wk_abs"),
        lit(null).cast("long").as("revenue_rank"))

    ranked.unionByName(stats)
  }

  /** X1: trim + case normalization as its own operator. */
  def trimCaseNormalize(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lower(trim(col("p_name"))).as("name_norm"),
      upper(trim(col("p_brand"))).as("brand_code"),
      concat(upper(substring(col("p_type"), 1, 1)), lower(substring(col("p_type"), 2, 1000))).as("type_title"))

  /** Executor-side slugification via the native codegen Expression
    * (graft.functions.Slugify). Inputs here are ASCII, so the DuckDB
    * oracle reproduces the NFKD-fold semantics with a plain regex
    * chain; the non-ASCII fold is pinned by SlugSpec instead.
    */
  def slugifyNames(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      graft.functions.Slugify.slugify(col("p_name")).as("name_slug"),
      graft.functions.Slugify.slugify(col("p_type")).as("type_slug"))

  val queries: Map[String, Relational.Q] = Map(
    "panel_pipeline" -> (panelPipeline _),
    "trim_case_normalize" -> (trimCaseNormalize _),
    "slugify_names" -> (slugifyNames _)
  )

  val oracleSql: Map[String, String] = Map(
    "slugify_names" ->
      """SELECT p_partkey,
        | lower(regexp_replace(regexp_replace(trim(p_name), '\s+', '_', 'g'),
        |   '[^a-zA-Z0-9_]', '', 'g')) AS name_slug,
        | lower(regexp_replace(regexp_replace(trim(p_type), '\s+', '_', 'g'),
        |   '[^a-zA-Z0-9_]', '', 'g')) AS type_slug
        |FROM part""".stripMargin,

    "panel_pipeline" ->
      """WITH panel AS (
        | SELECT n_name AS nation, weekofyear(o_orderdate) AS week,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS revenue
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY 1, 2),
        |ranked AS (
        | SELECT nation, week, revenue,
        |  round(revenue - lag(revenue, 1)
        |   OVER (PARTITION BY nation ORDER BY week), 4) AS revenue_1wk_abs,
        |  rank() OVER (PARTITION BY week ORDER BY revenue DESC, nation) AS revenue_rank
        | FROM panel)
        |SELECT nation, week, revenue, revenue_1wk_abs, revenue_rank FROM ranked
        |UNION ALL
        |SELECT 'ALL-mean', week, round(avg(revenue), 4), NULL, NULL
        |FROM ranked GROUP BY week""".stripMargin,

    "trim_case_normalize" ->
      """SELECT p_partkey,
        | lower(trim(p_name)) AS name_norm,
        | upper(trim(p_brand)) AS brand_code,
        | concat(upper(substr(p_type, 1, 1)), lower(substr(p_type, 2, 1000))) AS type_title
        |FROM part""".stripMargin
  )
}
