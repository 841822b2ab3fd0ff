package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is purely batch
  * (SURVEY.md §2.10) — its incrementality is file-level caching — so
  * the streaming tier here is the Spark-native generalization: the
  * same event-window aggregation as operators.Relational
  * .eventWindowAgg, expressed over readStream with a watermark, plus
  * a stateful sessionizer. At scale this is the ingest path: new
  * parquet landing in a directory is picked up incrementally
  * (Trigger.AvailableNow for catch-up batches).
  */
object StreamingOps {

  /** events.parquet schema as landed (ts = INT64 nanos; see
    * Tables.events for the batch-side handling).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a landing dir of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 1h event-time windows with a 2h watermark — the
    * streaming twin of the batch event_window_agg query (same buckets,
    * same aggregates).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user running stats via explicit state — the
    * KeyValueGroupedDataset.mapGroupsWithState surface for custom
    * stateful logic (the reference has no streaming; this is the
    * Spark-native generalization SURVEY §2.10 anticipates). State is
    * one small case class per user; at scale it lives in the state
    * store, partitioned by the group key.
    */
  case class UserEvent(user_id: Long, epoch_s: Long, value: Double)
  case class UserState(n: Long, sum: Double, lastSeen: Long)
  case class UserStats(user_id: Long, n: Long, sum_value: Double, last_seen: Long)

  def runningUserStats(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "CAST(unix_timestamp(ts) AS LONG) AS epoch_s",
        "coalesce(value, 0.0) AS value")
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserStats](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserState(acc.n + 1, acc.sum + e.value, math.max(acc.lastSeen, e.epoch_s))
          }
          state.update(next)
          UserStats(uid, next.n, next.sum, next.lastSeen)
      }
  }

  /** Streaming driver for runningUserStats (update mode, memory sink). */
  def runUserStatsOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = runningUserStats(readEvents(spark, dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Run to completion over whatever is in the landing dir (test/demo
    * harness): memory sink + processAllAvailable.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q: StreamingQuery = hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
