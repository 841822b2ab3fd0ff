package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.etl.SnapshotCatalog

/** Structured-Streaming TAIL of a transactional catalog table — the
  * manifest-gated twin of a file stream:
  *
  * {{{
  *   spark.readStream.format("graft-stream")
  *     .option("path", catalogDir).option("table", "documents")
  *     .load()
  * }}}
  *
  * Offsets are MANIFEST IDS (the CAS-ordered commit sequence), so a
  * micro-batch serves exactly the data dirs the table gained between
  * two committed snapshots: the planning diff of two dir lists —
  * metadata-only, O(dirs), no directory scan for new files — and only
  * dirs a manifest actually links, so in-flight or failed writers'
  * `u=` dirs are invisible (a raw file stream over the same directory
  * would serve phantom rows). Combined with `foreachBatch` +
  * `appendIfNew(writerId, batchId)` on the sink side this closes an
  * exactly-once catalog→catalog pipe: the batch id rides the
  * checkpoint, the writer ledger makes re-delivery a no-op.
  *
  * Append-only semantics (the Iceberg streaming-read stance): row-level
  * deletes and replacing commits do not retract already-served rows. A
  * REPLACED dir list (INSERT OVERWRITE / `commit` / `compact` rewrote
  * the table) either fails the stream loudly (default) or, with
  * `onReplace=skip`, re-baselines and serves nothing for that
  * transition — the right choice when replaces are compactions
  * (logically identical data, re-serving would duplicate).
  *
  * `startSnapshotId` bounds history: serve only dirs appended AFTER
  * that snapshot (`latest` resolves it at stream creation — convenient
  * but nondeterministic if the very first batch is replayed after a
  * crash; pin a concrete id for deterministic starts). Default serves
  * the table's full current content as batch 0.
  *
  * At 100 TB: each trigger costs one manifest read + one dir-list
  * resolve per offset (bounded by the segment layout), and the batch
  * plan is a plain parquet relation over ONLY the new dirs — pruning
  * and pushdown reach the scan, nothing rescans served history. */
class GraftStreamSource(spark: SparkSession, path: String, table: String,
    val schema: StructType, baselineDirs: Set[String],
    onReplace: String) extends Source {

  private def cat = new SnapshotCatalog(path)

  override def getOffset: Option[Offset] = {
    val c = cat
    c.currentId.filter(k => c.snapshotAt(k).tables.contains(table))
      .map(k => LongOffset(k.toLong))
  }

  private def idOf(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => other.json().trim.toInt
  }

  private def dirsAt(k: Int): Set[String] = {
    val snap = try cat.snapshotAt(k)
      catch {
        case e: java.nio.file.NoSuchFileException =>
          throw new IllegalStateException(
            s"stream offset $k of $path/$table was dropped by snapshot " +
              "retention; the stream fell behind — restart from a fresh " +
              "checkpoint", e)
      }
    if (snap.tables.contains(table)) snap.dataDirs(table).toSet
    else Set.empty
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endDirs = dirsAt(idOf(end))
    val base = start.map(s => dirsAt(idOf(s))).getOrElse(baselineDirs)
    val newDirs =
      if (base.subsetOf(endDirs)) endDirs -- base
      else if (onReplace == "skip") Set.empty[String]
      else throw new IllegalStateException(
        s"table $table was replaced between stream offsets " +
          s"${start.map(idOf).getOrElse("start")} and ${idOf(end)} " +
          "(INSERT OVERWRITE / commit / compact); catalog streaming is " +
          "append-only — restart from the replacing snapshot, or set " +
          "onReplace=skip to re-baseline across compactions")
    StreamingBridge.streamingParquetDF(spark,
      newDirs.toSeq.sorted.map(d => s"$path/$table/$d"), schema)
  }

  override def stop(): Unit = ()
}

/** `format("graft-stream")` registration, BOTH directions.
  *
  * Source options: `path` (catalog root), `table`, `startSnapshotId`
  * (id | `latest`), `onReplace` (`fail` | `skip`).
  *
  * Sink options: `path`, `table`, `writerId` (ledger key, default
  * `graft-stream-sink`), `statsCols` / `bloomCols` (comma-separated —
  * sidecars for the landed dirs). The sink is EXACTLY-ONCE without
  * `foreachBatch` boilerplate: each micro-batch lands through the
  * writer ledger (`appendIfNew` in Append mode, `commitIfNew` — a
  * replacing snapshot per batch — in Complete mode), keyed by the
  * stream's own batch id, so a batch re-delivered after a crash is a
  * committed no-op. Two tails MUST NOT share a `writerId` (the ledger
  * is per-writer monotone); give each stream its own. */
class GraftStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def required(parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new IllegalArgumentException(s"graft-stream needs option '$key'"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (path, table) = (required(parameters, "path"), required(parameters, "table"))
    val s = schema.getOrElse {
      val cat = new SnapshotCatalog(path)
      cat.snapshot().read(sqlContext.sparkSession, table).schema
    }
    (s"graft-stream[$path/$table]", s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (path, table) = (required(parameters, "path"), required(parameters, "table"))
    val spark = sqlContext.sparkSession
    val cat = new SnapshotCatalog(path)
    val resolved = schema.getOrElse(
      cat.snapshot().read(spark, table).schema)
    val baseline: Set[String] = parameters.get("startSnapshotId") match {
      case None => Set.empty[String]
      case Some("latest") =>
        cat.currentId.map(k => cat.snapshotAt(k))
          .filter(_.tables.contains(table))
          .map(_.dataDirs(table).toSet).getOrElse(Set.empty)
      case Some(k) => {
        val id = k.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"startSnapshotId must be a manifest id or 'latest', got: $k"))
        val snap = cat.snapshotAt(id)
        if (snap.tables.contains(table)) snap.dataDirs(table).toSet
        else Set.empty
      }
    }
    val onReplace = parameters.getOrElse("onReplace", "fail")
    require(onReplace == "fail" || onReplace == "skip",
      s"onReplace must be 'fail' or 'skip', got: $onReplace")
    new GraftStreamSource(spark, path, table, resolved, baseline, onReplace)
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val (path, table) = (required(parameters, "path"), required(parameters, "table"))
    require(partitionColumns.isEmpty,
      "graft-stream sink does not support partitionBy (dirs are the unit)")
    val complete = outputMode == OutputMode.Complete()
    require(complete || outputMode == OutputMode.Append(),
      s"graft-stream sink supports Append (fast-append per batch) and " +
        s"Complete (replacing commit per batch), got: $outputMode")
    // the ledger key must be UNIQUE per stream (two streams sharing a
    // writerId would no-op each other's batch ids) and STABLE across
    // restarts (exactly-once rides it). The checkpoint location is
    // both, so it's the default; an explicit writerId overrides.
    val writerId = parameters.get("writerId")
      .orElse(parameters.get("checkpointLocation")
        .orElse(parameters.get("checkpointlocation"))
        .map { c => // digest: the ledger key charset excludes '/'
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(c.getBytes("UTF-8"))
          "graft-stream-sink-" + md5.take(8).map("%02x".format(_)).mkString
        })
      .getOrElse("graft-stream-sink")
    def cols(key: String): Map[String, Seq[String]] =
      parameters.get(key).map(v => Map(table ->
        v.split(',').map(_.trim).filter(_.nonEmpty).toSeq)).getOrElse(Map.empty)
    val (st, bl) = (cols("statsCols"), cols("bloomCols"))
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // the incoming frame still carries the streaming logical plan
        // — rebatch it over the planned micro-batch RDD before any
        // fresh action (see StreamingBridge.rebatch)
        val batch = StreamingBridge.rebatch(data)
        // an empty micro-batch lands nothing (no empty dirs in the
        // catalog); skipping is crash-safe — a re-delivered empty
        // batch is empty again, and the ledger is per-batch, not
        // gap-free
        if (!complete && batch.isEmpty) return
        val cat = new SnapshotCatalog(path)
        if (complete) cat.commitIfNew(writerId, batchId, Map(table -> batch), st, bl)
        else cat.appendIfNew(writerId, batchId, Map(table -> batch), st, bl)
        ()
      }
    }
  }
}
