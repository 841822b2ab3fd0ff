package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data-capture shapes: applying a change set to a base table
  * (the re-crawl upsert every living corpus needs) and slowly-changing-
  * dimension (SCD2) validity intervals over an event log. Both are
  * single-shuffle plans: the merge is ONE keyed full-outer join (no
  * per-row lookups, no driver loops — the MERGE INTO shape without a
  * table format), and the interval build is ONE window over the change
  * key. At 100 TB the merge join is the canonical "big join" — keyed
  * shuffle both sides, AQE handles skew — and the window state per key
  * is a single row.
  */
object Cdc {

  /** Deterministic synthetic change set over the documents base:
    *  - doc_id % 17 == 0 -> update (normalized-case rewrite, rev 2)
    *  - doc_id % 23 == 0 -> delete tombstone
    *  - doc_id % 31 == 0 -> insert of a NEW id beyond max(doc_id)
    * (id + stride). Update wins over delete on the overlap (% 17 and
    * % 23): precedence is part of the merge semantics under test.
    */
  private def changeSet(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    // 1-row scalar aggregate: the insert-id stride (broadcast scalar,
    // same pattern as the corpus-stats crossJoins)
    val stride = base.agg((max(col("doc_id")) + 1L).as("stride"))
    val upd = base.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), upper(col("text")).as("text"), lit("U").as("op"))
    val del = base.filter(col("doc_id") % 23 === 0 && col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"), lit("D").as("op"))
    val ins = base.filter(col("doc_id") % 31 === 0).crossJoin(broadcast(stride))
      .select((col("doc_id") + col("stride")).as("doc_id"),
        concat(lit("ins: "), col("text")).as("text"), lit("I").as("op"))
    upd.unionByName(del).unionByName(ins)
  }

  /** MERGE of the change set into the base: deletes drop, updates
    * replace text (version 2), inserts append (version 1), untouched
    * rows pass through (version 1). One full-outer join on doc_id.
    */
  def cdcUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text").as("base_text"))
    val ch = changeSet(s, d)
      .select(col("doc_id"), col("text").as("ch_text"), col("op"))
    base.join(ch, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        col("doc_id"),
        coalesce(col("ch_text"), col("base_text")).as("text"),
        when(col("op") === "U", 2L).otherwise(1L).as("version"),
        coalesce(col("op"), lit("keep")).as("last_op"))
  }

  /** SCD2 validity intervals over the events log, per (user, event
    * type): each event starts a version valid until the key's next
    * event; the latest version closes at the standard far-future
    * sentinel (9999-12-31 as epoch micros) rather than NULL — the
    * warehouse convention, and a deterministic literal both engines
    * agree on. Interval edges are emitted as epoch-MICROSECOND longs
    * (`unix_micros`), not raw timestamps: the driver's events parquet
    * is TIMESTAMP(NANOS), which DuckDB keeps at nano precision while
    * Spark truncates to micros, so a raw-timestamp output can never
    * hash-match across engines (the asof_join pattern). One window
    * shuffle; the (valid_from_us, event_id) tiebreak keeps interval
    * edges engine-exact.
    */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("valid_from_us"), col("event_id"))
    // epoch_us('9999-12-31 00:00:00Z') — fixed sentinel, tz-independent
    val endOfTimeUs = 253402214400000000L
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("valid_from_us"), col("value"))
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("next_from").isNull)
      .withColumn("valid_to_us", coalesce(col("next_from"), lit(endOfTimeUs)))
      .drop("next_from")
  }

  val queries: Map[String, Relational.Q] = Map(
    "cdc_upsert" -> (cdcUpsert _),
    "scd2_history" -> (scd2History _)
  )

  val oracleSql: Map[String, String] = Map(
    "cdc_upsert" ->
      """WITH stride AS (SELECT max(doc_id) + 1 AS stride FROM documents),
        |ch AS (
        | SELECT doc_id, upper(text) AS text, 'U' AS op FROM documents
        |  WHERE doc_id % 17 = 0
        | UNION ALL
        | SELECT doc_id, NULL, 'D' FROM documents
        |  WHERE doc_id % 23 = 0 AND doc_id % 17 <> 0
        | UNION ALL
        | SELECT doc_id + stride.stride, 'ins: ' || text, 'I'
        |  FROM documents, stride WHERE doc_id % 31 = 0)
        |SELECT coalesce(b.doc_id, ch.doc_id) AS doc_id,
        | coalesce(ch.text, b.text) AS text,
        | CAST(CASE WHEN ch.op = 'U' THEN 2 ELSE 1 END AS BIGINT) AS version,
        | coalesce(ch.op, 'keep') AS last_op
        |FROM documents b FULL OUTER JOIN ch ON ch.doc_id = b.doc_id
        |WHERE coalesce(ch.op, '') <> 'D'""".stripMargin,

    "scd2_history" ->
      """WITH ev AS (
        | SELECT user_id, event_type, event_id,
        |  epoch_us(ts) AS valid_from_us, value
        | FROM events)
        |SELECT user_id, event_type, event_id, valid_from_us, value,
        | lead(valid_from_us) OVER w IS NULL AS is_current,
        | CAST(coalesce(lead(valid_from_us) OVER w, 253402214400000000) AS BIGINT) AS valid_to_us
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY valid_from_us, event_id)""".stripMargin
  )
}
