package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Pins the native RunLengthMax kernel equal to the expression fold it
  * replaced (the repetition_filter oracle's most-frequent-count).
  */
class RunLengthMaxSpec extends SparkTestBase {

  // the original expression-tree fold, kept as the reference semantics
  private def foldForm(sorted: org.apache.spark.sql.Column) =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  test("kernel == expression fold over the real corpus") {
    val diff = spark.read.parquet(s"$sf/documents.parquet")
      .select(array_sort(tokens(col("text"))).as("stoks"))
      .select(
        RunLengthMax.runLengthMax(col("stoks")).as("a"),
        foldForm(col("stoks")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0)
  }

  test("kernel == expression fold on edge inputs") {
    import spark.implicits._
    val rows: Seq[Seq[String]] = Seq(
      Seq(), Seq(""), Seq("", ""), Seq("a"), Seq("a", "a", "b"),
      Seq("a", "b", "b", "b", "c", "c"), Seq("x", "x", "x", "x"))
    val diff = rows.toDF("arr")
      .select(
        RunLengthMax.runLengthMax(col("arr")).as("a"),
        foldForm(col("arr")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0)
  }
}
