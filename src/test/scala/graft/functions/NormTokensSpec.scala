package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native NormTokens kernel: element-equal to the composed
  * split(normText) regex pipeline (the DuckDB-oracle contract), over
  * adversarial inputs and the real corpus; null handling, type check,
  * whole-stage codegen.
  */
class NormTokensSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel equals split(normText) on adversarial inputs") {
    val inputs = Seq("", " ", "   ", "a", "A", "a b", "  a  b  ",
      "Hello, World! 123", "tab\there\nnewline\rcr", "...!!!",
      "Ünïcode œuvre 東京 mixed ascii", "trailing space ", " leading",
      "UPPER lower MiXeD", "a-b_c.d", "0x1F 42 abc123",
      " vertical \f formfeed") ++
      (0 until 200).map(i => s"doc $i: word$i, punct!$i")
    val bad = inputs.toDF("s")
      .select(TextFunctions.tokens($"s").as("native"),
        TextFunctions.tokensComposed($"s").as("ref"))
      .filter(not($"native" <=> $"ref"))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("kernel equals the composed form over the real documents corpus") {
    val bad = graft.Tables.documents(spark, sf)
      .select(TextFunctions.tokens($"text").as("native"),
        TextFunctions.tokensComposed($"text").as("ref"))
      .filter(not($"native" <=> $"ref"))
      .count()
    assert(bad === 0)
  }

  test("token-free input yields [\"\"] (split's empty-string contract)") {
    val got = Seq("", "  ", "!!!", "東京").toDF("s")
      .select(TextFunctions.tokens($"s").as("t")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == Seq(""), r))
  }

  test("null in -> null out; non-string is a type-check failure") {
    val got = Seq(Some("x y"), None).toDF("s")
      .select(TextFunctions.tokens($"s")).collect()
    assert(got(0).getSeq[String](0) == Seq("x", "y"))
    assert(got(1).isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(TextFunctions.tokens($"n")).collect()
    }
    assert(e.getMessage.contains("norm_tokens"))
  }

  test("participates in whole-stage codegen") {
    val df = graft.Tables.documents(spark, sf)
      .select(TextFunctions.tokens($"text").as("t"))
    val hasWscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWscg, df.queryExecution.executedPlan.toString)
  }
}
