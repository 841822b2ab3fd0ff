package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Pins the native MarkerHits kernel equal to the
  * size(filter(toks, array_contains(lit(words), _))) form, and the cjk
  * class count equal to the regex form.
  */
class MarkerHitsSpec extends SparkTestBase {

  private val stop = Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

  test("kernel == filter/array_contains over the real corpus") {
    val bad = spark.read.parquet(s"$sf/documents.parquet")
      .select(tokens(col("text")).as("toks"))
      .select(
        MarkerHits.markerHits(col("toks"), stop).as("a"),
        size(filter(col("toks"), t => array_contains(lit(stop.toArray), t)))
          .cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad === 0)
  }

  test("kernel == filter form on edge arrays") {
    import spark.implicits._
    val rows: Seq[Seq[String]] = Seq(
      Seq(), Seq(""), Seq("the"), Seq("the", "the", "the"),
      Seq("x", "y"), Seq("the", "x", "of", "of"))
    val bad = rows.toDF("toks")
      .select(
        MarkerHits.markerHits(col("toks"), stop).as("a"),
        size(filter(col("toks"), t => array_contains(lit(stop.toArray), t)))
          .cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad === 0)
  }

  test("cjkCount == regexp_extract_all([一-鿿]) size") {
    import spark.implicits._
    val rows = Seq("", "abc", "中文 text", "一鿿 boundary", "mixed 中 a 文 b")
    val bad = rows.toDF("text")
      .select(
        CharStats.cjkCount(col("text")).as("a"),
        size(regexp_extract_all(col("text"), lit("[一-鿿]"), lit(0)))
          .cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad === 0)
  }
}
