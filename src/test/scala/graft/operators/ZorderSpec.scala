package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Z-order layout census: the Morton spread checked bit-by-bit
  * against a reference interleave on random keys, and the skipping
  * claim turned into numbers — under the zorder lane BOTH keys'
  * per-bucket zone-map spans are a fraction of the key range, while
  * the pk_sort lane leaves the suppkey span at ~full range. The
  * DuckDB oracle re-checks the bit algebra cross-engine.
  */
class ZorderSpec extends SparkTestBase {

  test("zValue == reference bit interleave on 512 random key pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val cases = (1 to 512).map(_ =>
      (rnd.nextLong().abs % 1000000L, rnd.nextLong().abs % 1000000L))
    def ref(pk: Long, sk: Long): Long = {
      val (p, s) = (pk & 0xFFFFL, sk & 0xFFFFL)
      (0 until 16).map(i =>
        (((p >> i) & 1L) << (2 * i)) | (((s >> i) & 1L) << (2 * i + 1))).sum
    }
    val got = cases.toDF("pk", "sk")
      .select(Profile.zValue(col("pk"), col("sk"))).as[Long].collect()
    cases.zip(got).foreach { case ((pk, sk), z) =>
      assert(z == ref(pk, sk), s"($pk, $sk)")
    }
  }

  test("zorder bounds BOTH dimensions; single-key sort leaves the other unbounded") {
    val rows = Profile.zorderLayout(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val (zo, ps) = rows.partition(_._1 == "zorder")
    assert(zo.nonEmpty && ps.nonEmpty)
    assert(zo.map(_._2).sum == ps.map(_._2).sum) // both lanes cover all rows
    val pkRange = rows.map(_._4).max - rows.map(_._3).min + 1
    val skRange = rows.map(_._6).max - rows.map(_._5).min + 1
    def wavg(xs: Seq[(Long, Long)]) = // row-weighted mean span
      xs.map { case (n, w) => n.toDouble * w }.sum / xs.map(_._1.toDouble).sum
    val zoSk = wavg(zo.map(t => (t._2, t._6 - t._5 + 1)))
    val psSk = wavg(ps.map(t => (t._2, t._6 - t._5 + 1)))
    val zoPk = wavg(zo.map(t => (t._2, t._4 - t._3 + 1)))
    // pk_sort: suppkey zone maps are useless (~full range)
    assert(psSk > 0.9 * skRange)
    // zorder: the suppkey span shrinks AND partkey stays bounded
    assert(zoSk < 0.6 * skRange, s"zorder sk span $zoSk vs range $skRange")
    assert(zoPk < 0.6 * pkRange, s"zorder pk span $zoPk vs range $pkRange")
  }

  test("pruning_skip_eval: single-key layout skips only its own key; zorder skips on both") {
    // the OPTIMIZE ZORDER justification as numbers (sf0.1 driver
    // corpus readout: pk_sort 63/64 on pk and 0/64 on sk; zorder
    // 56/64 = all but sqrt(files) on BOTH dimensions). Pinned as
    // properties so the tiny spec corpus (10 suppliers) stays valid.
    val rows = Profile.pruningSkipEval(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(rows.length == 12 && rows.forall(_._3 == 64L),
      "2 layouts x 2 cols x 3 probes over 64 simulated files")
    // WORST probe per (layout, col) must still meet the bound
    def worst(layout: String, c: String) = rows
      .collect { case (l, pc, _, sk) if l == layout && pc == c => sk }.min
    // pk_sort: near-total skipping on the sort key, none on the other
    assert(worst("pk_sort", "pk") >= 60L, rows.mkString(", "))
    assert(worst("pk_sort", "sk") == 0L, rows.mkString(", "))
    // zorder: substantial skipping on BOTH dimensions
    assert(worst("zorder", "pk") >= 32L, rows.mkString(", "))
    assert(worst("zorder", "sk") >= 32L, rows.mkString(", "))
  }
}
