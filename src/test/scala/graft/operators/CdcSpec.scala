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

  test("diffVersions: presence beats value nullness; updates are null-safe") {
    import spark.implicits._
    // old: 1 kept-same, 2 null->value, 3 value->null, 4 deleted (null
    // value!), 5 deleted, 7 null kept-null; new adds 6 (null value!)
    val o = Seq((1L, Some("a")), (2L, None), (3L, Some("c")),
      (4L, Option.empty[String]), (5L, Some("e")), (7L, None))
      .toDF("doc_id", "text")
    val n = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (6L, Option.empty[String]), (7L, None))
      .toDF("doc_id", "text")
    val ops = Cdc.diffVersions(o, n, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(ops == Map(1L -> "unchanged", 2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "delete", 6L -> "insert", 7L -> "unchanged"),
      ops.toString)
  }
}
