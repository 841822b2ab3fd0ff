package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native CharStats kernels: value-equal to the expression-tree form
  * they replaced (per-char array -> sort -> run-length fold — the form
  * the DuckDB oracle still computes list-wise), null handling, type
  * check, and whole-stage codegen.
  */
class CharStatsSpec extends SparkTestBase {
  import spark.implicits._

  // the replaced expression-tree form: 1-char array, sorted, folded
  private def chars(c: org.apache.spark.sql.Column) =
    TextFunctions.charShingles(c, 1)

  private val inputs = Seq("", "a", "aa", "abcabc", "the fast key order",
    "Ünïcode œuvre 東京 東京", "z" * 300, "a b c d e  f") ++
    (0 until 200).map(i => s"doc $i word$i filler text $i$i")

  test("rLnR kernel equals the sorted-fold form bit-for-bit") {
    val rows = inputs.toDF("s")
      .select($"s", chars($"s").as("cs"))
      .select($"s", CharStats.charRlnR($"s").as("native"),
        array_sort($"cs").as("scs"))
      .select($"s", $"native",
        aggregate($"scs",
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("acc")),
          (acc, c) => {
            val same = c === acc.getField("prev")
            def contrib(r: org.apache.spark.sql.Column) =
              when(r > 0, r.cast("double") * log(r.cast("double"))).otherwise(lit(0.0))
            struct(c.as("prev"),
              when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
              when(same, acc.getField("acc"))
                .otherwise(acc.getField("acc") + contrib(acc.getField("run"))).as("acc"))
          },
          acc => acc.getField("acc") +
            when(acc.getField("run") > 0,
              acc.getField("run").cast("double") * log(acc.getField("run").cast("double")))
              .otherwise(lit(0.0))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r)
    }
  }

  test("distinct kernel equals size(array_distinct(chars))") {
    val rows = inputs.toDF("s")
      .select(CharStats.charDistinct($"s").as("native"),
        size(array_distinct(chars($"s"))).cast("long").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("null in -> null out; non-string is a type-check failure") {
    val got = Seq(Some("x"), None).toDF("s")
      .select(CharStats.charRlnR($"s"), CharStats.charDistinct($"s")).collect()
    assert(!got(0).isNullAt(0) && !got(0).isNullAt(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(CharStats.charRlnR($"n")).collect()
    }
    assert(e.getMessage.contains("char_rlnr"))
  }

  test("punctCount/upperCount == regexp_extract_all sizes over corpus + edges") {
    val corpus = graft.Tables.documents(spark, sf).select($"text")
    val edges = Seq("", " ", "a!B?c", "ünï ☃", "ALL CAPS 123", "\t\r\n",
      "a@b.c 1.2.3.4").toDF("text")
    for (df <- Seq(corpus, edges)) {
      val bad = df.select(
        CharStats.punctCount($"text").as("p"),
        size(regexp_extract_all($"text", lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("long").as("pr"),
        CharStats.upperCount($"text").as("u"),
        size(regexp_extract_all($"text", lit("[A-Z]"), lit(0))).cast("long").as("ur"))
        .filter($"p" =!= $"pr" || $"u" =!= $"ur")
        .count()
      assert(bad === 0)
    }
  }

  test("participates in whole-stage codegen") {
    val df = graft.Tables.documents(spark, sf)
      .select(CharStats.charRlnR($"text").as("r"))
    val hasWscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWscg, df.queryExecution.executedPlan.toString)
  }
}
