package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native merge-walk intersect count must equal
  * size(array_intersect) on sorted distinct arrays.
  */
class IntersectCountSpec extends SparkTestBase {

  test("equals size(array_intersect) over real document token-set pairs") {
    val base = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        array_sort(array_distinct(col("toks"))).as("uni"))
    val a = base.select(col("source"), col("doc_id").as("da"), col("uni").as("ua"))
    val b = base.select(col("source"), col("doc_id").as("db"), col("uni").as("ub"))
    val pairs = a.join(b, Seq("source")).filter(col("da") < col("db"))
      .select(
        IntersectCount.intersectCount(col("ua"), col("ub")).as("native"),
        size(array_intersect(col("ua"), col("ub"))).as("builtin"))
    assert(pairs.count() > 0)
    assert(pairs.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("null array, empty array, disjoint and identical sets") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("b")),
      (Seq("a", "b"), Seq("a", "b")),
      (Seq.empty[String], Seq("a")),
      (null, Seq("a"))
    ).toDF("a", "b")
    val rows = df.select(
      IntersectCount.intersectCount(col("a"), col("b")).as("n")).collect()
    assert(rows(0).getInt(0) == 2)
    assert(rows(1).getInt(0) == 0)
    assert(rows(2).getInt(0) == 2)
    assert(rows(3).getInt(0) == 0)
    assert(rows(4).isNullAt(0))
  }
}
