package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hybrid RRF: full in-memory replay of both lanes + the fusion at
  * sf0.001 (rank from the already-oracle-pinned bm25 scores and a
  * fold-ordered cosine replay, fuse, compare row-for-row), structural
  * invariants, and the sf0.01 fusion headline — a doc mid-ranked in
  * BOTH lanes outranks every single-lane winner.
  */
class HybridRrfSpec extends SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("sf0.001: output == in-memory lane-rank + RRF replay") {
    val lexScores = Corpus.bm25Score(spark, sf)
      .select(col("doc_id"), col("bm25")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val lexRank = lexScores.sortBy { case (id, s) => (-s, id) }
      .take(20).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    val q = Retrieval.qvec
    val nq = math.sqrt(q.map(x => x * x).sum)
    val semScores = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect().map { r =>
        val v = r.getSeq[Float](1)
        // same sequential fold order as the DotProduct kernel
        var dotQ = 0.0; var nv = 0.0
        v.indices.foreach { i =>
          dotQ += v(i).toDouble * q(i); nv += v(i).toDouble * v(i).toDouble
        }
        (r.getLong(0), r6(dotQ / (math.sqrt(nv) * nq)))
      }
    val semRank = semScores.sortBy { case (id, s) => (-s, id) }
      .take(20).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    val expected = (lexRank.keySet ++ semRank.keySet).toSeq.map { id =>
      val rrf = lexRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        semRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, lexRank.get(id), semRank.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10).zipWithIndex
      .map { case ((id, lr, sr, rrf), i) => (id, lr, sr, r6(rrf), i + 1L) }

    val got = Retrieval.hybridRrf(spark, sf).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3), r.getLong(4))
    }.sortBy(_._5)
    assert(got.toSeq == expected.toSeq)
  }

  test("structural invariants: 10 dense fused ranks, lane ranks bounded, rrf consistent") {
    val rows = Retrieval.hybridRrf(spark, sf).collect()
    assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to 10L))
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.nonEmpty || sem.nonEmpty)
      (lex.toSeq ++ sem.toSeq).foreach(k => assert(k >= 1 && k <= 20))
      val rrf = lex.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
        sem.map(k => 1.0 / (60 + k)).getOrElse(0.0)
      assert(r.getDouble(3) == r6(rrf))
    }
  }

  test("sf0.01 headline: a both-lane mid-rank doc fuses above every single-lane winner") {
    val rows = Retrieval.hybridRrf(spark, "/root/testdata/sf0.01")
      .collect().sortBy(_.getLong(4))
    val top = rows.head
    assert(!top.isNullAt(1) && !top.isNullAt(2),
      "fused top-1 should be surfaced by BOTH lanes")
    assert(math.min(top.getLong(1), top.getLong(2)) > 1,
      "fusion should promote a doc neither lane ranked first")
  }
}
