package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Co-located joins via bucketing: both sides bucketed by the join key
  * -> sort-merge join with ZERO shuffle exchanges. This is the
  * pre-partitioning strategy for repeated fact-fact joins at scale
  * (pay the shuffle once at write time, never at query time).
  */
class BucketedJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bucketed fact-fact join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "l_orderkey").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_quantity").cast("decimal(20,6)")), 2).as("q"))
    joined.collect() // force the final (AQE) plan

    val shuffles = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    // the only shuffle allowed is the final groupBy on o_orderpriority
    // (different key); the JOIN itself must be exchange-free
    assert(shuffles.size <= 1, s"got ${shuffles.size} shuffles:\n" +
      joined.queryExecution.executedPlan)

    // value check against the plain (non-bucketed) path
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_quantity").cast("decimal(20,6)")), 2).as("q"))
    assert(joined.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(joined).count() == 0)
  }
}
