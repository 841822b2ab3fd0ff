package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the native NormText kernel bit-equal to the composed regex
  * chain it replaces — the contract every oracle SQL normalization
  * fragment is written against.
  */
class NormTextSpec extends SparkTestBase {

  test("kernel == composed regex chain over the real corpus") {
    val diff = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        NormText.normText(col("text")).as("a"),
        TextFunctions.normTextComposed(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0)
  }

  test("kernel == composed on adversarial inputs") {
    import spark.implicits._
    val rows = Seq(
      "", " ", "   ", "a", " a ", "A  B", "a,b;C!", "1.5%", "\t\nx\r",
      "--", "éclair café", "ABC123xyz", "a b", "ünïcode ☃ mix",
      "trailing space ", " leading", "double  space", "all!@#$%^&*()punct")
    val diff = rows.toDF("t")
      .select(
        NormText.normText(col("t")).as("a"),
        TextFunctions.normTextComposed(col("t")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0)
  }

  test("normalized text == tokens joined by single spaces") {
    val diff = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        NormText.normText(col("text")).as("a"),
        array_join(TextFunctions.tokens(col("text")), " ").as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0)
  }
}
