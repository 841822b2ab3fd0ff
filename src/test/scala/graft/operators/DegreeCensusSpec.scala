package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Degree census: closed-form hand graphs, CCDF laws, and the
  * structural contrast the operator exists to expose — the mutual-kNN
  * graph's degree is capped by construction while the LSH near-dup
  * graph grows clique hubs.
  */
class DegreeCensusSpec extends SparkTestBase {

  test("star graph: exact histogram and ccdf") {
    import spark.implicits._
    // star: center 0 with 5 leaves -> one deg-5 vertex, five deg-1
    val got = Graph.degreeCensusOf(
      (1L to 5L).map(l => (0L, l)).toDF("doc_a", "doc_b"), "g")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((5L, 1L, 166666L), (1L, 5L, 1000000L)))
  }

  test("corpus: ccdf laws hold; kNN degree is capped at k while LSH grows hubs") {
    val rows = Graph.degreeCensus(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    Seq("lsh", "knn").foreach { g =>
      val byDeg = rows.filter(_._1 == g).sortBy(_._2)
      assert(byDeg.nonEmpty)
      // smallest degree sees every vertex; ccdf strictly decreasing in deg
      assert(byDeg.head._4 == 1000000L)
      byDeg.map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a > b); case _ => ()
      }
    }
    assert(rows.filter(_._1 == "knn").map(_._2).max <= 3L,
      "mutual-kNN degree is bounded by k")
    assert(rows.filter(_._1 == "lsh").map(_._2).max >
      rows.filter(_._1 == "knn").map(_._2).max,
      "LSH clique hubs exceed the kNN cap")
  }
}
