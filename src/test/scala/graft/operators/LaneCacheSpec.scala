package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** LaneCache invalidation contract: reuse on an identical stamp,
  * rebuild on a generator-fingerprint change, rebuild on a source-table
  * change, and the src != dst refusal. The derive thunk's call count is
  * the observable — a stale-cache bug shows as a missing rebuild, a
  * thrash bug as an extra one.
  */
class LaneCacheSpec extends SparkTestBase {

  private def tmpSrc(name: String): String = {
    val dir = new java.io.File(s"target/lanecache_spec/$name").getCanonicalFile
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(new java.io.File(dir, "documents.parquet").getPath)
    dir.getPath
  }

  test("same stamp reuses; changed genFp or source rebuilds") {
    val src = tmpSrc("inval")
    val root = "target/lanecache_spec/cache_inval"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    var builds = 0
    def lane(fp: String) =
      LaneCache.cached(spark, src, "spec_lane", fp, Seq("documents"), root) {
        builds += 1
        spark.read.parquet(new java.io.File(src, "documents.parquet").getPath)
          .select(col("doc_id"), upper(col("text")).as("t"))
      }
    assert(lane("v1").count() == 3 && builds == 1, "first touch derives")
    assert(lane("v1").count() == 3 && builds == 1, "same stamp reuses")
    assert(lane("v2").count() == 3 && builds == 2, "genFp change rebuilds")
    assert(lane("v2").count() == 3 && builds == 2)
    // touch the source table: newer mtime must invalidate even with the
    // same genFp (the rebuilt-corpus-under-same-path hazard)
    val f = new java.io.File(src, "documents.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    f.setLastModified(f.lastModified() + 60000)
    assert(lane("v2").count() == 3 && builds == 3, "source change rebuilds")
  }

  private def laneDir(root: String, lane: String, src: String) =
    new java.io.File(s"$root/${lane}__" +
      new java.io.File(src).getCanonicalPath.stripPrefix("/")
        .replaceAll("[^A-Za-z0-9._-]", "_"))

  private def versionDirs(root: String, lane: String, src: String) =
    Option(laneDir(root, lane, src).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("v="))

  test("a torn publish never hides behind a valid marker") {
    val src = tmpSrc("torn")
    val root = "target/lanecache_spec/cache_torn"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def lane() =
      LaneCache.cached(spark, src, "torn_lane", "v1", Seq("documents"), root) {
        spark.read.parquet(new java.io.File(src, "documents.parquet").getPath)
      }
    lane().count()
    // simulate a kill that left data but destroyed the marker — the
    // next call must re-derive, not serve the unmarked directory
    val vs = versionDirs(root, "torn_lane", src)
    assert(vs.length == 1, s"one version dir expected, got $vs")
    val marker = new java.io.File(vs.head, "_GRAFT_LANE_DONE")
    assert(marker.exists(), s"marker expected at $marker")
    assert(marker.delete())
    assert(lane().count() == 3, "re-derives cleanly without a marker")
    assert(marker.exists(), "marker restored by the re-publish")
  }

  test("versioned publish: a rebuild never touches the superseded version; GC is grace-TTL-based") {
    // ADVICE r8 #4 + r9 #5: a reader in another JVM that lazily
    // resolved the previous version must keep its parquet files for a
    // grace TTL measured from the rebuild that SUPERSEDED it — not for
    // a fixed count of one generation, which a pair of quick rebuilds
    // defeats, and not by dir-mtime ordering, which coarse-mtime
    // filesystems misrank.
    val src = tmpSrc("versioned")
    val root = "target/lanecache_spec/cache_versioned"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def lane(fp: String, ttlMs: Long = 3600000L) =
      LaneCache.cached(spark, src, "ver_lane", fp, Seq("documents"), root,
        graceTtlMs = ttlMs) {
        spark.read.parquet(new java.io.File(src, "documents.parquet").getPath)
      }
    lane("g1").count()
    val v1 = versionDirs(root, "ver_lane", src)
    assert(v1.length == 1)
    // the in-flight-reader shape: resolve v1's path, rebuild, then scan
    val v1Path = v1.head.getPath
    lane("g2").count()
    assert(new java.io.File(v1Path).exists(),
      "superseded version must survive the rebuild that replaced it")
    assert(spark.read.parquet(v1Path).count() == 3,
      "stale reader still scans the superseded version")
    assert(versionDirs(root, "ver_lane", src).length == 2,
      "current + the in-grace superseded version")
    // TWO quick rebuilds inside the TTL: v1 STILL survives (the shape
    // the one-generation policy lost) — its superseded-marker is young
    lane("g3").count()
    assert(new java.io.File(v1Path).exists(),
      "an in-grace version survives ANY number of rebuilds inside the TTL")
    assert(versionDirs(root, "ver_lane", src).length == 3,
      "current + two in-grace versions")
    // age v1's superseded-marker past the TTL; the next rebuild reclaims
    // it while the still-young g2/g3 versions survive
    val sup1 = new java.io.File(v1Path, "_GRAFT_SUPERSEDED")
    assert(sup1.exists(), "superseded versions carry the marker")
    sup1.setLastModified(sup1.lastModified() - 120000L)
    lane("g4", ttlMs = 60000L).count()
    assert(!new java.io.File(v1Path).exists(),
      "a version superseded longer than the TTL is reclaimed")
    assert(versionDirs(root, "ver_lane", src).length == 3,
      s"g4 current + in-grace g2/g3, got ${versionDirs(root, "ver_lane", src).map(_.getName)}")
  }

  test("a stamp that reverts re-arms the grace: hit clears the stale superseded-marker") {
    // A -> B marks v=A superseded; reverting to A serves v=A again but
    // (pre-fix) left the stale marker, so a later rebuild reclaimed the
    // until-just-now CURRENT version with zero grace — mid-scan file
    // loss for a reader that resolved v=A while it was current.
    val src = tmpSrc("revert")
    val root = "target/lanecache_spec/cache_revert"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    def lane(fp: String) =
      LaneCache.cached(spark, src, "rev_lane", fp, Seq("documents"), root,
        graceTtlMs = 3600000L) {
        spark.read.parquet(new java.io.File(src, "documents.parquet").getPath)
      }
    lane("gA").count()
    val vA = versionDirs(root, "rev_lane", src).head.getPath
    lane("gB").count() // v=A superseded
    val marker = new java.io.File(vA, "_GRAFT_SUPERSEDED")
    assert(marker.exists())
    // age the marker far past any TTL, then REVERT: the hit must clear it
    marker.setLastModified(marker.lastModified() - 7200000L)
    lane("gA").count() // cache hit on v=A — current again
    assert(!marker.exists(), "hit clears the stale superseded-marker")
    // the next rebuild must NOT reclaim v=A (fresh marker, full grace)
    lane("gC").count()
    assert(new java.io.File(vA).exists(),
      "the reverted-then-superseded version keeps its full grace")
  }

  // note: the src != dst require in LaneCache.cached is defense-in-
  // depth that the key scheme makes unreachable (the cache key embeds
  // the mangled source path, so dst can never equal src) — kept in the
  // code per the r6 ScaleUp-incident discipline, not spec-exercised.
}
