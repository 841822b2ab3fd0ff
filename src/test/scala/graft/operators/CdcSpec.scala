package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** CDC merge + SCD2 interval invariants (the DuckDB oracle pins exact
  * values; these pin the semantic contract).
  */
class CdcSpec extends SparkTestBase {

  test("cdc_upsert: deletes drop, updates version 2, inserts beyond max id, keeps pass through") {
    val base = graft.Tables.documents(spark, sf)
    val baseN = base.count()
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    val merged = Cdc.cdcUpsert(spark, sf)
    val byOp = merged.groupBy(col("last_op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val nUpd = base.filter(col("doc_id") % 17 === 0).count()
    val nDel = base.filter(col("doc_id") % 23 === 0 && col("doc_id") % 17 =!= 0).count()
    val nIns = base.filter(col("doc_id") % 31 === 0).count()
    assert(byOp.getOrElse("U", 0L) == nUpd)
    assert(byOp.getOrElse("I", 0L) == nIns)
    assert(!byOp.contains("D"))
    assert(merged.count() == baseN - nDel + nIns)
    // versioning + id ranges
    assert(merged.filter(col("version") === 2).count() == nUpd)
    assert(merged.filter(col("last_op") === "I")
      .agg(min(col("doc_id"))).head().getLong(0) > maxId)
    // merge is key-unique
    assert(merged.select(col("doc_id")).distinct().count() == merged.count())
  }

  test("scd2_history: intervals chain per key and exactly one current version") {
    val h = Cdc.scd2History(spark, sf)
    // one open-ended (current) interval per (user, event_type) key
    val bad = h.groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("is_current").cast("long")).as("n_current"))
      .filter(col("n_current") =!= 1).count()
    assert(bad == 0)
    // closed intervals are strictly ordered: valid_from <= valid_to
    // (equal allowed: same-ts events are tie-broken by event_id)
    assert(h.filter(col("valid_to_us").isNotNull && col("valid_from_us") > col("valid_to_us"))
      .count() == 0)
    // row-preserving: every event starts exactly one version
    assert(h.count() == graft.Tables.events(spark, sf).count())
  }
}
