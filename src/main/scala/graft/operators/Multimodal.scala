package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with a typed metadata struct riding alongside. The decode
  * step is STUBBED (no image/audio codecs in this container) with a
  * deterministic fake — but the Spark-side contract is real: schema,
  * batch shape, partition-local decode via mapPartitions (the Scala
  * analogue of a Pandas-UDF batch), and SQL-expressible byte-level
  * features for the oracle.
  *
  * At 100 TB the payload column dominates storage: every query below
  * projects it away as early as possible, and the decode path is a
  * narrow mapPartitions (no shuffle) that a cluster scales linearly.
  */
object Multimodal {

  /** Typed row for the decode path. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, n_frames: Int, features: Array[Double])

  /** Documents table lifted to the media schema: payload = utf-8 bytes
    * of text standing in for an image/audio blob.
    */
  def asMedia(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder: a real build would hand `payload` to a codec here.
    * The fake derives a fixed-size feature vector from byte statistics
    * — deterministic, schema-correct, batch-shaped like the real one.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val nFeat = 8
    val acc = new Array[Double](nFeat)
    var i = 0
    while (i < payload.length) {
      acc(i % nFeat) += (payload(i) & 0xff).toDouble
      i += 1
    }
    val n = math.max(payload.length / nFeat, 1)
    acc.map(v => v / n / 255.0)
  }

  /** Frame sampling: every `stride`-th byte ("frame") of the payload. */
  def frameSample(payload: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < payload.length) { out(j) = payload(i); i += stride; j += 1 }
    out
  }

  /** Fused sample+decode — semantically `decodeStub(frameSample(p, stride))`
    * (pinned equal in MultimodalSpec) without materializing the frame
    * array: one primitive while-loop per row, zero allocation beyond the
    * 8-double accumulator. This is the hot path the decode query runs.
    */
  def decodeStrided(payload: Array[Byte], stride: Int): (Int, Array[Double]) = {
    val nFeat = 8
    val acc = new Array[Double](nFeat)
    var i = 0
    var j = 0
    while (i < payload.length) {
      acc(j % nFeat) += (payload(i) & 0xff).toDouble
      i += stride
      j += 1
    }
    val n = math.max(j / nFeat, 1)
    var k = 0
    while (k < nFeat) { acc(k) = acc(k) / n / 255.0; k += 1 }
    (j, acc)
  }

  /** The decode pipeline: mapPartitions over typed rows, one decode
    * call per row, batch-local — mirrors mapInPandas batch semantics.
    */
  def decodeFeatures(s: SparkSession, d: String, stride: Int = 16): DataFrame = {
    import s.implicits._
    asMedia(s, d)
      .select(col("doc_id"), col("payload"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (nFrames, feats) = decodeStrided(r.payload, stride)
          MediaFeatures(r.doc_id, r.n_bytes, nFrames, feats)
        }
      }
      .toDF()
  }

  /** Gate-shaped decode output: the feature vector posexploded to
    * (doc_id, n_bytes, n_frames, dim, value) scalar rows so the
    * driver's rows-only compare (pandas sort) can order it — an
    * array<double> column is unsortable there. Values rounded to 9 dp
    * purely to keep the dump byte-stable across JVMs; derived ints
    * cast to long for oracle type parity (DuckDB counts are BIGINT).
    */
  def decodeFeaturesFlat(s: SparkSession, d: String): DataFrame =
    decodeFeatures(s, d)
      .select(col("doc_id"), col("n_bytes"), col("n_frames").cast("long").as("n_frames"),
        posexplode(col("features")).as(Seq("dim", "value")))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        col("dim").cast("long").as("dim"), round(col("value"), 9).as("value"))

  /** SQL-expressible byte-level features (oracle-checkable): payload
    * size, first-4-byte header (via whole-blob hex — DuckDB lacks
    * binary substring), and a stub per-dim pseudo-feature.
    */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val bin = col("text").cast("binary")
    val fake = (0 until 4).map { dd =>
      (round((hash60(concat(col("doc_id").cast("string"), lit(s"_$dd"))) % 1000).cast("double") / 1000, 3))
        .as(s"feat$dd")
    }
    Tables.documents(s, d).select(
      Seq(col("doc_id"),
        length(bin).cast("long").as("n_bytes"),
        lower(substring(hex(bin), 1, 8)).as("header_hex")) ++ fake: _*)
  }

  val queries: Map[String, Relational.Q] = Map(
    "multimodal_features" -> (multimodalFeatures _),
    // mapPartitions decode path; the stub decoder is pure byte
    // arithmetic, so the oracle replays it in DuckDB via hex-pair
    // byte extraction (no BLOB substring there: hex the whole blob,
    // then substr) — value semantics also pinned by MultimodalSpec.
    "multimodal_decode" -> (decodeFeaturesFlat _)
  )

  private val fakeSql = (0 until 4).map { dd =>
    s"round(CAST((('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), '_$dd')), 1, 15))::BIGINT % 1000) AS DOUBLE) / 1000, 3) AS feat$dd"
  }.mkString(",\n ")

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT doc_id,
         | octet_length(text::BLOB) AS n_bytes,
         | lower(substr(hex(text::BLOB), 1, 8)) AS header_hex,
         | $fakeSql
         |FROM documents""".stripMargin,

    // decodeStrided(payload, 16) replayed in SQL: frame j reads byte
    // j*16 (hex pair at 32*j+1), accumulator dim = j % 8 (the strided
    // range picks each dim's frames directly), n = max(n_frames // 8, 1).
    "multimodal_decode" ->
      """WITH base AS (
        | SELECT doc_id,
        |  octet_length(text::BLOB) AS n_bytes,
        |  hex(text::BLOB) AS h,
        |  (octet_length(text::BLOB) + 15) // 16 AS n_frames
        | FROM documents),
        |d AS (
        | SELECT doc_id, n_bytes, n_frames, h, unnest(range(0, 8)) AS dim
        | FROM base)
        |SELECT doc_id, n_bytes, n_frames, dim,
        | round(coalesce(list_sum(list_transform(range(dim, n_frames, 8),
        |   j -> ('0x' || substr(h, CAST(32 * j + 1 AS INT), 2))::INT)), 0)::DOUBLE
        |  / greatest(n_frames // 8, 1) / 255.0, 9) AS value
        |FROM d""".stripMargin
  )
}
