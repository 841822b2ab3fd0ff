package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Plan lint over EVERY registered query: each must analyze + plan
  * cleanly against the test corpus, and no plan may contain an
  * unkeyed CartesianProductExec — the shape that cannot run at scale.
  * (Broadcast nested-loop joins against 1-row aggregates or pinned
  * tiny query sets are legitimate and are not flagged.) This catches a
  * future operator that accidentally drops its join key long before
  * the bench or the driver gate would.
  */
class PlanGuardSpec extends SparkTestBase {

  // Queries whose registered form EAGERLY materializes internal stages
  // (localCheckpoint + driver certificate): linting that form would
  // execute the job and see only a checkpoint-RDD scan. These lazy
  // twins are the same composition with materialization off, so the
  // join shapes stay visible to the cartesian check.
  private val lazyTwins: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "heavy_hitters" -> ((s, d) => graft.operators.Sketch.heavyHitters(s, d, materialize = false)),
    "similarity_pagerank" -> ((s, d) => graft.operators.Graph.similarityPagerank(s, d, materialize = false)),
    "triangle_count" -> ((s, d) => graft.operators.Graph.triangleCount(s, d, materialize = false)))

  test("every registered query plans without a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val lintFn = lazyTwins.getOrElse(name, fn)
        val plan = lintFn(spark, sf).queryExecution.executedPlan
        val cart = flattenPlan(plan).exists(_.isInstanceOf[CartesianProductExec])
        if (cart) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
