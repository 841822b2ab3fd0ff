package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Ann, Dedup, Multimodal, Relational, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes every implemented operator from SURVEY.md §2 (plus
  * the LLM-data-pipeline extensions) as a named query over the testdata
  * parquet tables; `oracleSql` carries the DuckDB-equivalent SQL for
  * the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship: the reference's full analytical shape (SURVEY.md §3.2)
    * replayed over the synthetic star schema — dimension-enriched panel
    * (entity = nation x returnflag, time = epoch-day bucket), per-panel
    * lag deltas (W1), and within-cohort ranks (W3). One broadcast join,
    * one agg shuffle, two window shuffles — same stage shape the ASPEP
    * pipeline needs (SURVEY.md §4.4).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val o  = Tables.orders(spark, d)
    val c  = Tables.customer(spark, d)
    val n  = Tables.nation(spark, d)

    val panel = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        weekofyear(col("o_orderdate")).as("week"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))

    val wLag  = Window.partitionBy("nation").orderBy("week")
    val wRank = Window.partitionBy("week").orderBy(col("revenue").desc)
    panel
      .withColumn("revenue_1wk_abs", col("revenue") - lag(col("revenue"), 1).over(wLag))
      .withColumn("revenue_rank", rank().over(wRank))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Ann.queries ++ Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Ann.oracleSql ++ Multimodal.oracleSql
}
