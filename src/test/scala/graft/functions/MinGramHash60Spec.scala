package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Pins the native MinGramHash60 winnowing kernel bit-equal to the
  * composed array_min(transform(charShingles, hash60)) form — the
  * contract the doc_fingerprint oracle SQL is written against.
  */
class MinGramHash60Spec extends SparkTestBase {

  private def composed(norm: org.apache.spark.sql.Column, k: Int) =
    array_min(transform(charShingles(norm, k), g => hash60(g)))

  test("kernel == composed form over the real corpus (k = 8)") {
    val diff = spark.read.parquet(s"$sf/documents.parquet")
      .select(normText(col("text")).as("norm"))
      .select(
        MinGramHash60.minGramHash60(col("norm"), 8).as("a"),
        composed(col("norm"), 8).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff === 0)
  }

  test("short strings yield null, exact-k strings yield the single gram hash") {
    import spark.implicits._
    val r = Seq("1234567", "12345678", "").toDF("norm")
      .select(col("norm"), MinGramHash60.minGramHash60(col("norm"), 8).as("h"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(r("1234567") == null && r("") == null)
    assert(r("12345678") === Hash60Check.ref("12345678"))
  }

  test("non-ASCII input windows by codepoint, matching the composed form") {
    import spark.implicits._
    val rows = Seq("中文的测试字符串长度", "mixédàccénts here", "ab中cd文ef的gh",
      "short中", "exactly中文八个字符呀")
    val bad = rows.toDF("norm")
      .select(
        MinGramHash60.minGramHash60(col("norm"), 8).as("a"),
        composed(col("norm"), 8).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(bad === 0)
  }

  test("minimum is over all windows") {
    import spark.implicits._
    val s = "abcdefghij" // windows: abcdefgh, bcdefghi, cdefghij
    val expect = Seq("abcdefgh", "bcdefghi", "cdefghij").map(Hash60Check.ref).min
    val got = Seq(s).toDF("norm")
      .select(MinGramHash60.minGramHash60(col("norm"), 8)).head.getLong(0)
    assert(got === expect)
  }
}
