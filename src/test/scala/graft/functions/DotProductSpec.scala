package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The native DotProduct expression must be bit-identical to the
  * expression-tree form it replaced (same sequential fold), share its
  * null semantics, and stay inside whole-stage codegen.
  */
class DotProductSpec extends SparkTestBase {

  private def treeDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to aggregate(zip_with) on real embeddings") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(VectorFunctions.toDouble(col("embedding")).as("v"))
    val diff = e.select(
        DotProduct.dot(col("v"), col("v")).as("native"),
        treeDot(col("v"), col("v")).as("tree"))
      .filter(col("native") =!= col("tree"))
    assert(diff.count() == 0)
  }

  test("raw float input == cast-then-multiply (in-kernel widening)") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("embedding").as("f"),
        VectorFunctions.toDouble(col("embedding")).as("d"))
    val diff = e.select(
        DotProduct.dot(col("f"), col("f")).as("ff"),
        DotProduct.dot(col("f"), col("d")).as("fd"),
        DotProduct.dot(col("d"), col("d")).as("dd"),
        treeDot(col("d"), col("d")).as("tree"))
      .filter(col("ff") =!= col("tree") || col("fd") =!= col("tree") ||
        col("dd") =!= col("tree"))
    assert(diff.count() == 0)
  }

  test("null semantics: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      (null, Seq[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val rows = df.select(
        DotProduct.dot(col("a"), col("b")).as("native"),
        treeDot(col("a"), col("b")).as("tree"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(VectorFunctions.toDouble(col("embedding")).as("v"))
      .select(DotProduct.dot(col("v"), col("v")).as("d"))
      .filter(col("d") > 0)
    val plan = e.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val hasWsc = plan.exists {
      case w: WholeStageCodegenExec =>
        w.toString.contains("dot_product") || w.child.toString.contains("dot_product")
      case _ => false
    }
    assert(hasWsc, s"expected dot_product inside WholeStageCodegen:\n$plan")
    // and it must actually produce rows (codegen compiled, no fallback crash)
    assert(e.count() > 0)
  }

  test("SQL registration") {
    DotProduct.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
