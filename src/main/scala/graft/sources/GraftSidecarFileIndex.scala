package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.SnapshotCatalog

/** The SQL path's file-skipping seam (VERDICT r12 next #1): the file
  * index [[GraftSnapshotTable]] plans over. Spark's `FileScan` asks
  * its index for files WITH the scan's pushed data filters —
  * `fileIndex.listFiles(partitionFilters, dataFilters)` — which is
  * exactly where a table format intersects predicates with its own
  * planning metadata (Iceberg does the same inside its `Scan`
  * planning). This index delegates the listing to
  * [[InMemoryFileIndex]] and then drops every file the snapshot's
  * stats/Bloom sidecars PROVE cannot hold a matching row, via
  * [[SnapshotCatalog.Snapshot.pruneFilesSql]] — so a selective
  * `WHERE id BETWEEN ...` / `= key` over SQL opens the same file set
  * `readPruned` / `readPrunedPoint` open through the API, instead of
  * every file of the snapshot.
  *
  * Placing the skip in the index (rather than a custom ScanBuilder
  * that rebuilds the scan over a narrowed listing) keeps the WHOLE
  * ParquetScanBuilder surface intact — filter pushdown, column
  * pruning, aggregate pushdown, runtime filtering — because no scan
  * state is ever copied; only the listing the scan was always going
  * to ask for is answered more precisely. Pruning is conservative by
  * construction: conjuncts the extractor does not understand
  * contribute nothing, every unknown keeps the file, and Spark
  * re-applies the full predicate to the rows that are read, so an
  * over-kept file can never leak a row. Schema inference, partition
  * discovery, and `inputFiles` are untouched (they answer from the
  * full listing).
  */
class GraftSidecarFileIndex(
    spark: SparkSession,
    snap: SnapshotCatalog.Snapshot,
    table: String,
    dirs: Seq[String])
  extends InMemoryFileIndex(spark, dirs.map(new Path(_)),
    Map.empty[String, String], None) {

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val (ranges, points) = GraftSidecarFileIndex.extract(dataFilters)
    if (ranges.isEmpty && points.isEmpty) return base
    val (kept, total) = snap.pruneFilesSql(table, ranges, points)
    if (kept.size >= total) return base
    // kept paths are dir-qualified relative names (u=<nonce>/<file>);
    // a listed file's last two path segments are exactly that key
    val keptSet = kept.toSet
    base.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        val p = f.getPath
        keptSet.contains(s"${p.getParent.getName}/${p.getName}")
      })
    }.filter(_.files.nonEmpty)
  }
}

object GraftSidecarFileIndex {

  /** Conservative conjunct extraction from the scan's catalyst data
    * filters (each element of `conjuncts` is ANDed by the caller):
    * comparisons between a bare attribute and a foldable literal
    * become interval bounds, equality/IN become point probes, nested
    * `And`s recurse. Anything else — `Or`, `Not`, casts, functions,
    * nested fields, NULL literals, types the sidecars don't profile —
    * contributes NOTHING (never a wrong bound): the scan still applies
    * the full predicate to every row it reads. Strict bounds are
    * relaxed to inclusive — widening only ever keeps more files. */
  private[sources] def extract(conjuncts: Seq[Expression])
      : (Seq[(String, Option[Any], Option[Any])], Seq[(String, Seq[Any])]) = {
    val ranges = Seq.newBuilder[(String, Option[Any], Option[Any])]
    val points = Seq.newBuilder[(String, Seq[Any])]
    def ext(l: Literal): Option[Any] = (l.value, l.dataType) match {
      case (null, _) => None
      case (v: UTF8String, StringType) => Some(v.toString)
      case (v, ByteType | ShortType | IntegerType | LongType) => Some(v)
      case (v: Decimal, _) => Some(v.toBigDecimal)
      case (v, FloatType | DoubleType) => Some(v)
      case _ => None // dates/timestamps/binary: not sidecar-profiled
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a: Attribute, l: Literal) =>
        ext(l).foreach(v => points += ((a.name, Seq(v))))
      case EqualTo(l: Literal, a: Attribute) =>
        ext(l).foreach(v => points += ((a.name, Seq(v))))
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null =>
        ext(l).foreach(v => points += ((a.name, Seq(v))))
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null =>
        ext(l).foreach(v => points += ((a.name, Seq(v))))
      case GreaterThan(a: Attribute, l: Literal) =>
        ext(l).foreach(v => ranges += ((a.name, Some(v), None)))
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        ext(l).foreach(v => ranges += ((a.name, Some(v), None)))
      case LessThan(a: Attribute, l: Literal) =>
        ext(l).foreach(v => ranges += ((a.name, None, Some(v))))
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        ext(l).foreach(v => ranges += ((a.name, None, Some(v))))
      // literal-first comparisons flip the bound side
      case GreaterThan(l: Literal, a: Attribute) =>
        ext(l).foreach(v => ranges += ((a.name, None, Some(v))))
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        ext(l).foreach(v => ranges += ((a.name, None, Some(v))))
      case LessThan(l: Literal, a: Attribute) =>
        ext(l).foreach(v => ranges += ((a.name, Some(v), None)))
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        ext(l).foreach(v => ranges += ((a.name, Some(v), None)))
      case In(a: Attribute, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val cv = vs.map(v => ext(v.asInstanceOf[Literal]))
        if (cv.forall(_.isDefined)) points += ((a.name, cv.map(_.get)))
      case InSet(a: Attribute, hset) if hset.nonEmpty && hset.size <= 4096 =>
        val cv = hset.toSeq.map(v => ext(Literal(v, a.dataType)))
        if (cv.forall(_.isDefined)) points += ((a.name, cv.map(_.get)))
      case _ => () // unsupported shape: no pruning contribution
    }
    conjuncts.foreach(walk)
    (ranges.result(), points.result())
  }
}
