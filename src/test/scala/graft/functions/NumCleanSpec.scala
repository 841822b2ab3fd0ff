package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the native GroupDigits / CleanNumeric kernels value-identical
  * to format_number(x, 0) and the cleanNumericStr regex chain.
  */
class NumCleanSpec extends SparkTestBase {

  test("groupDigits == format_number(x, 0) over corpus-derived and edge longs") {
    import spark.implicits._
    val edges = Seq(0L, 1L, -1L, 999L, 1000L, -999L, -1000L, 123456789L,
      -123456789L, Long.MaxValue, Long.MinValue).toDF("n")
    val corpus = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(floor(col("l_extendedprice")).cast("long").as("n"))
    for (df <- Seq(edges, corpus)) {
      val bad = df.select(
        NumClean.groupDigits(col("n")).as("a"),
        format_number(col("n"), 0).as("b"))
        .filter(col("a") =!= col("b"))
        .count()
      assert(bad === 0)
    }
  }

  test("cleanNumeric kernel == regex chain on messy and adversarial strings") {
    import spark.implicits._
    val rows = Seq(
      "1,234", "(1,234)", "−5,000", "–42", "—7", "(−1,2,3)", "()", "(x)",
      "plain", "", "(", ")", "(unclosed", "closed)", "(a)b", "a(b)",
      "(multi\nline)", "tail\n", "(tail)\n", "1,2(3),4", "((nested))")
    val bad = rows.toDF("s").select(
      NumClean.cleanNumericStr(col("s")).as("a"),
      Cleaning.cleanNumericStrComposed(col("s")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad === 0)
  }

  test("end-to-end cleaned doubles match the composed pipeline on the real query shape") {
    val base = floor(col("l_extendedprice")).cast("long")
    val fmt = NumClean.groupDigits(base)
    val messy = when(col("l_discount") > 0.07, concat(lit("("), fmt, lit(")")))
      .when(col("l_discount") > 0.04, concat(lit("−"), fmt))
      .otherwise(fmt)
    val bad = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(
        Cleaning.cleanNumeric(messy).as("a"),
        Cleaning.cleanNumericStrComposed(messy).try_cast("double").as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad === 0)
  }
}
