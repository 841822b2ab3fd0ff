package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range-sorted parquet layout — the storage-side half of the 100 TB
  * SCAN story (Bucketing covers joins). `repartitionByRange` on the
  * predicate column gives files non-overlapping value ranges, and
  * `sortWithinPartitions` makes every parquet row group's min/max
  * stats a tight interval. A later range predicate on that column
  * then prunes at BOTH granularities — whole files via Catalyst
  * partition/file skipping, and row groups inside surviving files via
  * the parquet reader's min/max pushdown — so the scan touches
  * O(selectivity) bytes instead of the full table. This is the
  * pay-at-ingest move that makes time-range queries on an append-only
  * 100 TB event log cheap forever after.
  *
  * SortedLayoutSpec proves the pruning honestly: the same predicate
  * over the same rows reads a small fraction of the row groups from
  * the sorted layout that it reads from a value-shuffled layout
  * (small `parquet.block.size` forces many row groups even at test
  * scale, so the skip is observable in the scan's numOutputRows
  * metric).
  */
object SortedLayout {

  /** Timestamps must land as annotated INT64 micros, not legacy INT96:
    * INT96 carries no usable min/max statistics and timestamp
    * predicates are never pushed down onto it, which silently disables
    * the entire point of the sorted layout. Part of the layout
    * contract, so it lives here, not in the spec.
    */
  private def withMicrosTimestamps[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = s.conf.get(key)
    s.conf.set(key, "TIMESTAMP_MICROS")
    try body finally s.conf.set(key, prev)
  }

  /** Write the events table range-sorted by event time. The small
    * parquet block size is test-scale plumbing (makes row groups
    * numerous enough to observe pruning); production uses the default
    * 128 MB blocks and the identical layout logic.
    */
  def writeSorted(s: SparkSession, d: String, path: String,
      blockSize: Int = 1 << 20): Unit = withMicrosTimestamps(s) {
    Tables.events(s, d)
      .repartitionByRange(8, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.option("parquet.block.size", blockSize.toString)
      .mode("overwrite").parquet(path)
  }

  /** Same rows, same block size, but value-shuffled: every row group
    * spans nearly the full ts range, so min/max pruning keeps nothing.
    * The control arm of the layout experiment.
    */
  def writeShuffled(s: SparkSession, d: String, path: String,
      blockSize: Int = 1 << 20): Unit = withMicrosTimestamps(s) {
    Tables.events(s, d)
      .repartition(8, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.option("parquet.block.size", blockSize.toString)
      .mode("overwrite").parquet(path)
  }

  /** A narrow time-range count over a written layout. */
  def rangeCount(s: SparkSession, path: String,
      lo: String, hi: String): DataFrame =
    s.read.parquet(path)
      .filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))
      .agg(count(lit(1)).as("n"))
}
