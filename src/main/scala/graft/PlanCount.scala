package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Diagnostic twin of ExplainMain: print the exchange/join/window node
  * census of each named query's physical plan — the numbers
  * PlanGuardSpec pins. Run with the SAME config the specs use
  * (local[4], 4 shuffle partitions) so the pinned counts match:
  * `sbt "runMain graft.PlanCount <sfDir> <query>..."`.
  */
object PlanCount {

  /** The node kinds whose counts form a plan's pinned signature. */
  val Kinds: Seq[String] = Seq(
    "ShuffleExchangeExec", "BroadcastExchangeExec",
    "SortMergeJoinExec", "BroadcastHashJoinExec", "ShuffledHashJoinExec",
    "BroadcastNestedLoopJoinExec", "CartesianProductExec", "WindowExec",
    "WindowGroupLimitExec", "GenerateExec")

  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(flatten) ++ p.subqueries.flatMap(flatten)
  }

  /** kind -> count over the whole plan, zero-count kinds omitted. */
  def signature(p: SparkPlan): Map[String, Int] =
    flatten(p).groupBy(_.getClass.getSimpleName)
      .view.filterKeys(Kinds.contains).mapValues(_.size).toMap

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan
      val sig = signature(plan).toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(", ")
      println(s"[plancount] $n :: $sig")
    }
    spark.stop()
  }
}
