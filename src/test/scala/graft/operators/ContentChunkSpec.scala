package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

/** Content-defined chunking: boundary-rule replay with the static
  * Hash60 kernel, token conservation over the corpus, and the reason
  * the technique exists — a head-of-document insertion re-synchronizes
  * CDC chunks at the next boundary while fixed-stride chunks lose all
  * alignment.
  */
class ContentChunkSpec extends SparkTestBase {

  private def h60(s: String): Long =
    graft.functions.Hash60.md5Hash60(UTF8String.fromString(s))

  private def replayChunks(toks: Seq[String]): Seq[(String, Long)] = {
    val n = toks.length
    val bps = (1 to n).filter(i => h60(toks(i - 1)) % 16 == 0 || i == n)
    (0L +: bps.map(_.toLong)).sliding(2).map { case Seq(prev, b) =>
      (toks.slice(prev.toInt, b.toInt).mkString(" "), b - prev)
    }.toSeq
  }

  // deterministic word stream with hash-boundary words sprinkled in
  private def words(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"w${(i * 2654435761L + seed) % 997}")

  test("hand docs: chunking == Scala boundary-rule replay; every token in exactly one chunk") {
    import spark.implicits._
    val docs = Seq((1L, words(7, 120).mkString(" ")),
      (2L, words(13, 45).mkString(" ")), (3L, "solo"))
    val got = Dedup.contentChunks(docs.toDF("doc_id", "text"))
      .orderBy(col("doc_id"), col("chunk_text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = docs.flatMap { case (id, text) =>
      replayChunks(text.split(" ").toSeq).map { case (ct, len) =>
        (id, ct, h60(ct), len)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected)
    docs.foreach { case (id, text) =>
      val lens = expected.filter(_._1 == id).map(_._4).sum
      assert(lens == text.split(" ").length.toLong, s"doc $id token conservation")
    }
  }

  test("head insertion re-synchronizes CDC chunks; fixed-stride loses all alignment") {
    import spark.implicits._
    val base = words(3, 300)
    val edited = Seq("inserted", "noise") ++ base
    val df = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val ch = Dedup.contentChunks(df).select(col("doc_id"), col("chunk_hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = ch.filter(_._1 == 1L).map(_._2).toSet
    val b = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = (a intersect b).size
    assert(a.size > 5, s"need several chunks, got ${a.size}")
    // all but the first (shifted) chunk re-synchronize
    assert(shared >= a.size - 1, s"CDC shared $shared of ${a.size}")
    // fixed-stride 16-token chunks of the same pair share nothing:
    // the 2-token shift misaligns every window
    def strided(t: Seq[String]) =
      t.grouped(16).map(_.mkString(" ")).toSet
    assert((strided(base) intersect strided(edited)).isEmpty)
  }

  test("sf0.001 spectrum: bands disjoint, counts exact vs chunk-table replay") {
    val chunks = Dedup.contentChunks(
      graft.Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val perHash = chunks.groupBy(_._2).map { case (h, xs) =>
      (h, xs.length.toLong, xs.map(_._1).distinct.length.toLong, xs.map(_._3).min)
    }.toSeq
    val expected = perHash.groupBy(_._2).map { case (freq, xs) =>
      (freq, xs.length.toLong, xs.count(_._3 > 1).toLong,
        xs.map(x => x._4 * (freq - 1)).sum)
    }.toSet
    val got = Dedup.contentChunkDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }
}
