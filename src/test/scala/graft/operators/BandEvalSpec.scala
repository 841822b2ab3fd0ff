package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

/** LSH banding eval: full in-memory replay of universe, truth, and all
  * four banded rules; the nesting laws of the OR/AND construction; and
  * the S-curve headline on sf0.01 — the production (4, 2) keeps full
  * recall at a fraction of (8, 1)'s false-positive volume.
  */
class BandEvalSpec extends SparkTestBase {

  private val P = 2147483647L

  private def h60(s: String): Long =
    graft.functions.Hash60.md5Hash60(UTF8String.fromString(s))

  test("sf0.001: output == in-memory universe + truth + band replay") {
    val toks = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toIndexedSeq)
    val shs = toks.map { case (id, t) =>
      id -> (if (t.length >= 3)
        (0 to t.length - 3).map(i => h60(t.slice(i, i + 3).mkString(" ")) % P)
          .distinct.sorted
      else IndexedSeq.empty[Long])
    }.filter(_._2.nonEmpty)
    val sigs = shs.map { case (id, hv) =>
      id -> (0 until 8).map { j =>
        hv.map(h => (h * (2 * j + 3) + (101 * j + 7)) % P).min
      }
    }.toMap
    val byId = shs.toMap
    val ids = shs.map(_._1).sorted
    val n = ids.length.toLong
    val univ = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if byId(a).toSet.intersect(byId(b).toSet).nonEmpty
    } yield (a, b)).toSeq
    def cand(a: Long, b: Long, bands: Int, r: Int): Boolean =
      (0 until bands).exists(k =>
        (0 until r).forall(j => sigs(a)(k * r + j) == sigs(b)(k * r + j)))
    val configs = Seq((8, 1), (4, 2), (2, 4), (1, 8))
    val expected = configs.map { case (bn, r) =>
      val rows = univ.map { case (a, b) =>
        val ia = byId(a).toSet.intersect(byId(b).toSet).size
        (cand(a, b, bn, r), 3 * ia >= byId(a).size + byId(b).size)
      }
      val tp = rows.count(x => x._1 && x._2).toLong
      val fp = rows.count(x => x._1 && !x._2).toLong
      val fn = rows.count(x => !x._1 && x._2).toLong
      val tnU = rows.count(x => !x._1 && !x._2).toLong
      val tn = tnU + n * (n - 1) / 2 - univ.length
      s"b${bn}_r$r" -> ((tp, fp, fn, tn))
    }.toMap
    val got = Dedup.lshBandEval(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("sf0.01: candidate nesting laws hold and (4,2) is the knee") {
    val rows = Dedup.lshBandEval(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val order = Seq("b1_r8", "b2_r4", "b4_r2", "b8_r1")
    // nesting: stricter rows-per-band -> fewer candidates, both kinds
    order.sliding(2).foreach { case Seq(lo, hi) =>
      assert(rows(lo)._1 <= rows(hi)._1, s"tp nesting $lo vs $hi")
      assert(rows(lo)._2 <= rows(hi)._2, s"fp nesting $lo vs $hi")
    }
    // every config scores the same pair universe
    val totals = rows.values.map(t => t._1 + t._2 + t._3 + t._4).toSet
    assert(totals.size == 1)
    // the knee: production (4,2) keeps FULL recall with a fraction of
    // (8,1)'s false positives
    assert(rows("b4_r2")._3 == 0, "b4_r2 should miss no positive")
    assert(rows("b4_r2")._2 * 5 < rows("b8_r1")._2,
      s"b4_r2 fp ${rows("b4_r2")._2} should be <20% of b8_r1 ${rows("b8_r1")._2}")
  }

  /** Cross-plan pin: the dense plan (prefix-filtered truth + band-key
    * equi-join, NO pair universe) must produce the exact confusion
    * matrix the universe plan produces — two independent algorithms,
    * one answer. This is the 100 TB escape for lsh_band_eval (measured
    * 25.3 -> 9.0 s at sf1, 511.9 -> 114.5 s at sf10, docs/PLANS.md r8).
    */
  test("dense plan == universe plan, driver corpus, both scales here") {
    for (d <- Seq(sf, "/root/testdata/sf0.01")) {
      val uni = Dedup.lshBandEval(spark, d).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val dense = AdvCorpus.lshBandEvalDense(spark, d).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(dense == uni, s"matrix mismatch at $d")
    }
  }

  /** n_cand is each config's honest LSH-join candidate volume: it must
    * equal tp + fp, nest along the OR-construction, and sit far below
    * the pair universe the old plan evaluates. */
  test("dense n_cand: consistency, nesting, and volume on sf0.01") {
    val rows = AdvCorpus.lshBandEvalDense(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { case (cfg, (nCand, tp, fp)) =>
      assert(nCand == tp + fp, s"$cfg n_cand != tp + fp") }
    val order = Seq("b1_r8", "b2_r4", "b4_r2", "b8_r1")
    order.sliding(2).foreach { case Seq(lo, hi) =>
      assert(rows(lo)._1 <= rows(hi)._1, s"n_cand nesting $lo vs $hi")
    }
    // the pair universe at sf0.01 is 11,533 pairs (docs/PLANS.md); the
    // dense plan's worst config evaluates well under 10% of it
    assert(rows("b8_r1")._1 < 1200, s"b8_r1 n_cand ${rows("b8_r1")._1}")
  }
}
