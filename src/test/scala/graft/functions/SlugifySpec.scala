package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native Slugify expression: semantics equal the driver-side Slug,
  * null handling, SQL registration, and whole-stage codegen.
  */
class SlugifySpec extends SparkTestBase {
  import spark.implicits._

  test("expression equals driver-side Slug.slugify on varied inputs") {
    val inputs = Seq("Full-Time Payroll (x)", "  a  b\tc ", "Ünïcode Street",
      "UPPER_case-123", "", "français œuvre")
    val got = inputs.toDF("s")
      .select(Slugify.slugify($"s")).as[String].collect()
    assert(got.toSeq == inputs.map(graft.etl.Slug.slugify))
  }

  test("null in -> null out (nullIntolerant)") {
    val got = Seq(Some("x y"), None).toDF("s")
      .select(Slugify.slugify($"s")).collect()
    assert(got(0).getString(0) == "x_y")
    assert(got(1).isNullAt(0))
  }

  test("SQL registration") {
    Slugify.register(spark)
    val r = spark.sql("SELECT slugify('Hello  World!') AS s").head()
    assert(r.getString(0) == "hello_world")
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    // needs a real scan: local relations constant-fold to LocalTableScan
    val df = graft.Tables.part(spark, sf)
      .select(Slugify.slugify($"p_name").as("s"))
    val hasWscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWscg, df.queryExecution.executedPlan.toString)
    assert(df.count() == graft.Tables.part(spark, sf).count())
  }
}
