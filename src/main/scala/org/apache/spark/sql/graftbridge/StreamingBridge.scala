package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Same-package bridge for the V1 streaming `Source` contract (the
  * conversion helpers are `private[sql]`, the documented third-party
  * extension pattern — see [[ColumnBridge]]).
  *
  * `Source.getBatch` must return a DataFrame whose logical plan is
  * marked STREAMING (`MicroBatchExecution` asserts it), yet built from
  * batch data the source resolved itself. This is exactly what Spark's
  * own `FileStreamSource.getBatch` does: resolve a parquet relation
  * over the batch's file list and wrap it in
  * `LogicalRelation(..., isStreaming = true)` — keeping the relation a
  * real `HadoopFsRelation`, so column pruning and filter pushdown from
  * the streaming query still reach the parquet scan (an
  * `internalCreateDataFrame(toRdd)` wrapper would opaque them away).
  */
object StreamingBridge {

  /** The inverse bridge, for the SINK side: the DataFrame handed to a
    * V1 `Sink.addBatch` still carries the STREAMING logical plan (its
    * `queryExecution` is the micro-batch's IncrementalExecution), so
    * any fresh action on it — `isEmpty`, `df.write.parquet` — plans a
    * new batch QueryExecution over a streaming source and fails
    * `assertSupported`. Rebatching hands downstream code a plain
    * batch DataFrame over the ALREADY-PLANNED incremental physical
    * plan's row RDD (lazy — executed when the consumer acts), which
    * is how Spark's own V1 sinks consume the batch. */
  def rebatch(data: DataFrame): DataFrame = {
    val cs = data.sparkSession.asInstanceOf[ClassicSession]
    cs.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }

  def streamingParquetDF(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSession]
    val relation = DataSource(
      sparkSession = cs,
      className = "parquet",
      paths = paths,
      userSpecifiedSchema = Some(schema)
    ).resolveRelation(checkFilesExist = false)
    Dataset.ofRows(cs, LogicalRelation(relation, isStreaming = true))
  }
}
