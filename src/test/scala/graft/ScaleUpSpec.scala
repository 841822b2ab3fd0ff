package graft

import org.apache.spark.sql.functions._

/** ScaleUp must multiply row counts, preserve referential integrity
  * per replica, keep replica 0 byte-identical, and keep blocking-key
  * group sizes CONSTANT (not growing) so pair workloads scale
  * linearly with the factor.
  */
class ScaleUpSpec extends SparkTestBase {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sf3").toString
    ScaleUp.run(spark, sf, dir, 3)
    dir
  }

  test("row counts multiply by factor; dims untouched") {
    assert(Tables.load(spark, out, "lineitem").count() ==
      3 * Tables.load(spark, sf, "lineitem").count())
    assert(Tables.load(spark, out, "documents").count() ==
      3 * Tables.load(spark, sf, "documents").count())
    assert(Tables.load(spark, out, "nation").count() ==
      Tables.load(spark, sf, "nation").count())
  }

  test("referential integrity: every scaled lineitem joins an order, every order a customer") {
    val o = Tables.load(spark, out, "orders")
    val l = Tables.load(spark, out, "lineitem")
    val c = Tables.load(spark, out, "customer")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
    // and the join multiplies exactly: per-replica joins don't cross
    val baseJoin = Tables.load(spark, sf, "lineitem").join(
      Tables.load(spark, sf, "orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(l.join(o, l("l_orderkey") === o("o_orderkey")).count() == 3 * baseJoin)
  }

  test("replica 0 is byte-identical for documents") {
    val origCount = Tables.load(spark, sf, "documents").count()
    val matched = Tables.load(spark, out, "documents")
      .join(Tables.load(spark, sf, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars")).count()
    assert(matched == origCount)
  }

  test("blocking-key group sizes stay constant (linear pair scaling)") {
    def maxBlock(d: String): Long =
      Tables.load(spark, d, "documents").groupBy(col("source")).count()
        .agg(max(col("count"))).first().getLong(0)
    assert(maxBlock(out) == maxBlock(sf))
    // replicas share no text: word-prefixing makes cross-replica
    // shingle sets disjoint, so exact-dup counts replicate too
    val origDups = operators.Dedup.dedupExact(spark, sf)
      .agg(sum(col("dup_count"))).first().getLong(0)
    val scaledDups = operators.Dedup.dedupExact(spark, out)
      .agg(sum(col("dup_count"))).first().getLong(0)
    assert(scaledDups == 3 * origDups)
  }

  test("embeddings: labels partition per replica, vectors preserved") {
    val e = Tables.load(spark, out, "embeddings")
    val base = Tables.load(spark, sf, "embeddings")
    assert(e.select(col("label")).distinct().count() ==
      3 * base.select(col("label")).distinct().count())
    def maxList(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("label")).count().agg(max(col("count"))).first().getLong(0)
    assert(maxList(e) == maxList(base))
  }

  test("events: users partition per replica, timestamps preserved") {
    val ev = Tables.events(spark, out)
    val base = Tables.events(spark, sf)
    assert(ev.count() == 3 * base.count())
    assert(ev.select(col("user_id")).distinct().count() ==
      3 * base.select(col("user_id")).distinct().count())
    assert(ev.agg(min(col("ts")), max(col("ts"))).first() ==
      base.agg(min(col("ts")), max(col("ts"))).first())
  }
}
