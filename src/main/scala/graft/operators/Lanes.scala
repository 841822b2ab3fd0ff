package graft.operators

import org.apache.spark.sql.SparkSession

/** Lane warm-up entry point (VERDICT r8 "What's wrong" #2): LaneCache
  * derives a lane on first touch, so whichever CONSUMER query hit a
  * cold cache first used to absorb the ~10 s lsh / ~1.8 s knn build
  * into its timed bench window — per-query numbers depended on cache
  * warmth and Map iteration order. Bench now calls [[prewarm]] from its
  * UNTIMED warm-up (per scale dir), so every timed consumer measures
  * its own algorithm over an already-materialized lane; the build cost
  * itself stays measured by the lane-DEFINING queries
  * (dedup_minhash_lsh, knn_graph), which always compute live.
  */
object Lanes {

  /** Build (or just validate the stamp of) every disk-materialized
    * lane for source dir `d`. Derivation happens synchronously inside
    * LaneCache.cached on a stamp miss; the returned scans are
    * discarded. */
  def prewarm(s: SparkSession, d: String): Unit = {
    Dedup.lshPairsCached(s, d)
    VectorOps.knnGraphCached(s, d)
    AdvCorpus.advDocuments(s, d)
    AdvAnn.advEmbeddings(s, d)
    ()
  }
}
