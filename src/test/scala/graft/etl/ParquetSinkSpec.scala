package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** K3: the year-partitioned parquet sink must give partition pruning
  * on year-filtered reads (the scan lists only the matching
  * directories — the scale path for the combined table).
  */
class ParquetSinkSpec extends SparkTestBase {

  test("partitionBy(year) write + pruned read-back") {
    val dir = java.nio.file.Files.createTempDirectory("k3").toString
    val df = graft.Tables.orders(spark, sf)
      .withColumn("year", year(col("o_orderdate")))
    Writers.parquetByYear(df, dir)

    val back = spark.read.parquet(dir).filter(col("year") === 1997)
    val expected = df.filter(col("year") === 1997).count()
    assert(back.count() == expected && expected > 0)

    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // pruning visible: the filter made it into PartitionFilters, not
    // a post-scan Filter over all partitions
    assert(scan.contains("(year") || scan.contains("year#"), scan)
    val partDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("year="))
    assert(partDirs >= 1)
  }
}
