package graft.operators

import graft.SparkTestBase

/** Survivor election: hand clusters (longest wins over a min-id stub,
  * token ties fall to min id, exactly one survivor per cluster) and
  * the full-corpus invariants against dedup_clusters' membership. The
  * DuckDB oracle re-checks the election cross-engine.
  */
class SurvivorSpec extends SparkTestBase {

  test("longest member wins even when a stub holds the smallest id; ties fall to min id") {
    import spark.implicits._
    val m = Seq(
      // cluster 10: doc 10 is a 3-token stub, doc 17 is the full doc
      (10L, 10L, 3L), (17L, 10L, 40L), (12L, 10L, 40L),
      // cluster 20: all equal lengths -> min id survives
      (20L, 20L, 7L), (21L, 20L, 7L), (25L, 20L, 7L)
    ).toDF("doc_id", "cluster_id", "n_tokens")
    val got = Dedup.survivorElection(m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    // ties on max tokens (17 and 12): min id 12 survives
    assert(got(10L) == ((12L, false)))
    assert(got(12L) == ((12L, true)))
    assert(got(17L) == ((12L, false)))
    assert(got(20L) == ((20L, true)))
    assert(got(21L) == ((20L, false)) && got(25L) == ((20L, false)))
  }

  test("dedup_survivors: one survivor per cluster; survivor has max tokens; same membership as dedup_clusters") {
    val rows = Dedup.dedupSurvivors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cid, ms) =>
      val survivors = ms.filter(_._5)
      assert(survivors.length == 1, s"cluster $cid")
      val s = survivors.head
      assert(s._4 == s._1)
      assert(ms.forall(_._3 <= s._3), s"cluster $cid: survivor not longest")
      assert(ms.filter(_._3 == s._3).forall(_._1 >= s._1))
    }
    val clusterDocs = Dedup.dedupClusters(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == clusterDocs)
  }

  test("dedup_keep_stats: partitions add up; drops == clustered docs minus clusters; totals == corpus") {
    val stats = Dedup.dedupKeepStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    stats.foreach { case (lang, nDocs, nKept, nDropped, tTot, tKept, tDrop) =>
      assert(nKept + nDropped == nDocs, s"lang $lang doc partition")
      assert(tKept + tDrop == tTot, s"lang $lang token partition")
    }
    val surv = Dedup.dedupSurvivors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val expectedDropped = surv.length - surv.map(_._2).distinct.length
    assert(stats.map(_._4).sum == expectedDropped.toLong,
      "every cluster keeps exactly one member")
    val nCorpus = graft.Tables.documents(spark, sf).count()
    assert(stats.map(_._2).sum == nCorpus)
  }
}
