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
}
