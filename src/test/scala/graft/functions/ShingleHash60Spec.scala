package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Pins the native ShingleHash60 kernel bit-equal to the composed
  * expression form it replaces — the contract the DuckDB oracle SQL is
  * written against.
  */
class ShingleHash60Spec extends SparkTestBase {

  private def composed(toks: org.apache.spark.sql.Column, k: Int) =
    transform(wordShingles(toks, k), g => hash60(g))

  test("kernel == composed transform(wordShingles, hash60) over the real corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    for (k <- Seq(2, 3, 8)) {
      val diff = docs.select(
        ShingleHash60.shingleHash60(col("toks"), k).as("a"),
        composed(col("toks"), k).as("b"))
        .filter(col("a") =!= col("b"))
        .count()
      assert(diff === 0, s"k=$k mismatch")
    }
  }

  test("short inputs yield empty arrays, k == n yields one gram") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq("only")),
      (3L, Seq[String]()),
      (4L, Seq("x", "y", "z"))).toDF("id", "toks")
    val r = df.select(col("id"),
      ShingleHash60.shingleHash60(col("toks"), 3).as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(r(1L).isEmpty && r(2L).isEmpty && r(3L).isEmpty)
    assert(r(4L) === Seq(Hash60Check.ref("x y z")))
  }

  test("gram hash equals hash60 of the space-joined gram string") {
    import spark.implicits._
    val df = Seq((1L, Seq("hello", "world", "again"))).toDF("id", "toks")
    val got = df.select(ShingleHash60.shingleHash60(col("toks"), 2).as("h"))
      .head.getSeq[Long](0)
    assert(got === Seq(Hash60Check.ref("hello world"), Hash60Check.ref("world again")))
  }

  test("null elements are skipped like array_join skips them") {
    import spark.implicits._
    // composed form: array_join drops null elements without a
    // separator, so [a, null, b] windows hash like the joined survivors
    val df = Seq((1L, Seq("a", null, "b"))).toDF("id", "toks")
    val got = df.select(ShingleHash60.shingleHash60(col("toks"), 3).as("h"))
      .head.getSeq[Long](0)
    assert(got === Seq(Hash60Check.ref("a b")))
    val composed = df.select(
      transform(wordShingles(col("toks"), 3), g => hash60(g)).as("h"))
      .head.getSeq[Long](0)
    assert(got === composed)
  }

  test("non-array input is a type-check failure") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    val e = intercept[Exception] {
      df.select(ShingleHash60.shingleHash60(col("x"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}

/** Independent reference: first 15 md5 hex nibbles parsed base-16. */
object Hash60Check {
  def ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
}
