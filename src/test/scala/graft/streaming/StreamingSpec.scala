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
}
