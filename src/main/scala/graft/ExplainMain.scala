package graft

import org.apache.spark.sql.SparkSession

/** Plan audit utility: print the formatted physical plan for one or
  * all queries. usage: runMain graft.ExplainMain [queryName] [sfDir]
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else ""
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the documented SQL deployment shape (matches Verify/Bench):
      // without the extension the catalog queries that leave live
      // delete vectors fail loudly during construction
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets =
      if (name.nonEmpty && name != "-") Seq(name)
      else SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
