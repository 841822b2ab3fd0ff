package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** adv_ann_eval: full in-memory replay of the generator, brute truth,
  * both candidate lanes, and the per-band rollup at sf0.001; plus the
  * structural pins the corpus is engineered for (power-law cluster
  * sizes, intra-cluster cosine ~0.99, geometry-aware LSH beating
  * metadata-cell IVF in every band).
  */
class AdvAnnSpec extends SparkTestBase {

  private val P = 2147483647L

  // the generator, replayed in plain Scala
  private def cid(vecId: Long): Long = {
    val hr = ((vecId % 1048576L) * 48271L + 13L) % P
    val hb = (hr % 8L).toInt
    val hp = 1L << hb
    hp + ((hr / 8L) % hp)
  }
  private def band(vecId: Long): Long =
    (((vecId % 1048576L) * 48271L + 13L) % P) % 8L
  private def vec(vecId: Long): IndexedSeq[Double] = {
    val c = cid(vecId)
    (0 until 64).map { d =>
      val cm = ((c * 2654435761L) + (d * 40503L) + 97L) % P
      val cent = (cm % 2001L) - 1000L
      val jm = ((vecId % 1048576L) * 69069L + d * 101L + 3L) % P
      val jit = ((jm * 48271L) % P) % 201L - 100L
      (cent + jit).toDouble / 1000.0
    }
  }
  private def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("sf0.001: generator columns match the replay exactly") {
    val got = AdvAnn.advEmbeddings(spark, sf)
      .select(col("vec_id"), col("band"), col("cid"), col("v"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == band(id), s"band of $id")
      assert(r.getLong(2) == cid(id), s"cid of $id")
      val v = r.getSeq[Double](3)
      assert(v == vec(id), s"vector of $id")
    }
  }

  test("engineered geometry: intra-cluster cosine high, cross low") {
    val byCid = (0L until 500L).map(i => i -> cid(i)).groupBy(_._2)
    val big = byCid.filter(_._2.size >= 2)
    assert(big.nonEmpty)
    val intra = for {
      (_, ms) <- big.toSeq; Seq(a, b) <- ms.map(_._1).combinations(2)
    } yield cos(vec(a), vec(b))
    assert(intra.forall(_ > 0.95), s"min intra ${intra.min}")
    // a hub exists: the largest cluster holds >= 8% of the corpus
    assert(byCid.values.map(_.size).max >= 40,
      s"hub size ${byCid.values.map(_.size).max}")
    val cross = cos(vec(byCid.keys.head), // two different centroids
      vec(byCid.keys.last))
    assert(math.abs(cross) < 0.5)
  }

  test("sf0.01: rrf fusion recovers BOTH relevance channels whole") {
    val rows = AdvAnn.advHybridRrf(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    // single lanes see only their own channel...
    assert(rows(("lex", "parent"))._2 == 1000000L)
    assert(rows(("sem", "knn3"))._2 == 1000000L)
    assert(rows(("sem", "parent"))._2 == 0L,
      "parents must NOT be semantically reachable (cid independent of text)")
    assert(rows(("lex", "knn3"))._2 < 200000L,
      "cluster-mates must NOT be lexically reachable")
    // ...the fusion sees both — the measured reason hybrid_rrf exists
    assert(rows(("rrf", "parent"))._2 == 1000000L)
    assert(rows(("rrf", "knn3"))._2 == 1000000L)
    assert(rows.values.forall(_._1 > 0), "both truth channels non-empty")
  }

  test("sf0.01: lsh (geometry) beats ivf_label (metadata) in every band") {
    val rows = AdvAnn.advAnnEval(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(6)).toMap
    val bands = rows.keys.map(_._2).toSeq.distinct
    assert(bands.size == 8)
    bands.foreach { b =>
      assert(rows(("lsh", b)) > rows(("ivf_label", b)),
        s"band $b: lsh ${rows(("lsh", b))} vs ivf ${rows(("ivf_label", b))}")
      assert(rows(("lsh", b)) >= 800000, s"band $b lsh recall")
      assert(rows(("ivf_label", b)) <= 400000, s"band $b ivf recall")
    }
  }
}
