package graft.streaming

import graft.SparkTestBase
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The streaming hourly aggregation must agree with its batch twin on
  * a static landing directory.
  */
class StreamingSpec extends SparkTestBase {

  test("streaming hourly agg == batch event_window_agg") {
    val streamed = StreamingOps.runOnce(spark, sf, "stream_hourly")
    val batch = Relational.eventWindowAgg(spark, sf)
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("bucket", "event_type"), "full")
      .filter(streamed("n") =!= batch("n") ||
        abs(streamed("sum_value") - batch("sum_value")) > 1e-6)
    assert(diff.count() == 0)
  }

  test("stateful mapGroupsWithState running stats == batch groupBy") {
    val streamed = StreamingOps.runUserStatsOnce(spark, sf, "stream_user_stats")
    val batch = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(expr("coalesce(value, 0.0)")).as("sum_value"),
        max(expr("CAST(unix_timestamp(ts) AS LONG)")).as("last_seen"))
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("user_id"), "full")
      .filter(streamed("n") =!= batch("n") ||
        abs(streamed("sum_value") - batch("sum_value")) > 1e-6 ||
        streamed("last_seen") =!= batch("last_seen"))
    assert(diff.count() == 0)
  }
}