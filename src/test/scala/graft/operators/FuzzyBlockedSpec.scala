package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The composed-blocking fuzzy match vs the plain length-bucket
  * census: the blocked pair set must be a SUBSET (the simhash band is
  * a pruning condition added to the same block key) and the close-
  * match retention is the honest recall readout — pinned here on the
  * sf0.01 corpus where the census finds its one close pair.
  */
class FuzzyBlockedSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.01"

  test("blocked candidates are a subset of the census candidates, close matches retained") {
    val census = Dedup.fuzzyMatchCensus(spark, d)
      .agg(sum(col("n_pairs")), sum(col("n_close"))).head()
    val blocked = Dedup.fuzzyMatchBlocked(spark, d)
      .agg(sum(col("n_pairs")), sum(col("n_close"))).head()
    assert(blocked.getLong(0) <= census.getLong(0),
      "composed key examined MORE pairs than the plain block")
    assert(blocked.getLong(0) < census.getLong(0),
      "composed key pruned nothing — band adds no selectivity here")
    // the distance<=24 matches the census found must survive banding
    assert(blocked.getLong(1) == census.getLong(1),
      s"close matches lost: census ${census.getLong(1)}, blocked ${blocked.getLong(1)}")
  }

  test("per-source doc counts match the census (banding loses no docs)") {
    val a = Dedup.fuzzyMatchCensus(spark, d)
      .select(col("source"), col("n_docs"))
    val b = Dedup.fuzzyMatchBlocked(spark, d)
      .select(col("source"), col("n_docs"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
