package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native Hash60 kernel: bit-equal to the composed md5/conv formula it
  * replaced (the formula IS the DuckDB-oracle contract), null
  * handling, type check, and whole-stage codegen.
  */
class Hash60Spec extends SparkTestBase {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("kernel equals conv(substring(md5,1,15),16,10) on varied inputs") {
    val inputs = Seq("", "a", "spark graft", "Ünïcode œuvre 東京",
      "x" * 5000, "smp42", "tk0", "a b c d e") ++
      (0 until 500).map(i => s"doc_$i word$i")
    val rows = inputs.toDF("s")
      .select(Hash60.hash60($"s").as("native"), composed($"s").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    // 60-bit: always non-negative, below 2^60
    rows.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 60)))
  }

  test("null in -> null out") {
    val got = Seq(Some("x"), None).toDF("s")
      .select(Hash60.hash60($"s")).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
  }

  test("non-string input is a type-check failure") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(Hash60.hash60($"n")).collect()
    }
    assert(e.getMessage.contains("hash60"))
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    val df = graft.Tables.part(spark, sf)
      .select(Hash60.hash60($"p_name").as("h"))
    val hasWscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWscg, df.queryExecution.executedPlan.toString)
  }
}
