package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.etl.SnapshotCatalog

/** Structured-Streaming tail of a catalog table (`graft-stream`):
  * micro-batches serve exactly the manifest-linked dirs appended
  * between offsets — phantom (uncommitted) dirs invisible, re-runs
  * serve nothing new, the exactly-once writer ledger closes a
  * catalog→catalog pipe, replaces fail loudly or re-baseline with
  * `onReplace=skip`, and `startSnapshotId` bounds history.
  */
class GraftStreamSourceSpec extends SparkTestBase {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = new java.io.File(s"target/stream_spec/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    d.getPath
  }

  private def facts(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"k$i")).toDF("id", "k")

  /** One AvailableNow pass of the tail into a sink catalog through the
    * exactly-once ledger; returns after the run completes. */
  private def runTail(src: String, ckpt: String, sink: SnapshotCatalog,
      extra: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-stream")
      .option("path", src).option("table", "t")
    extra.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
        if (!df.isEmpty) sink.appendIfNew("tail", bid, Map("t" -> df))
        ()
      }
      .start()
    q.awaitTermination()
  }

  private def ids(cat: SnapshotCatalog): Seq[Long] =
    cat.snapshot().read(spark, "t").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("tail serves exactly the appended dirs; phantom dirs invisible; re-delivery no-ops") {
    val src = freshDir("tail_src")
    val snk = freshDir("tail_snk")
    val ckpt = freshDir("tail_ckpt")
    val cat = new SnapshotCatalog(src)
    val sink = new SnapshotCatalog(snk)
    cat.commit(Map("t" -> facts(1, 10).repartition(2))) // m1
    runTail(src, ckpt, sink)
    assert(ids(sink) == (1L to 10L), "batch 0 must serve the full seed")
    // an in-flight/failed writer's dir: parquet INSIDE the table dir
    // but never linked by any manifest — a raw file stream would serve
    // these phantom rows; the manifest-gated tail must not
    facts(900, 909).write.parquet(s"$src/t/u=phantomdir00")
    cat.append(Map("t" -> facts(11, 20).repartition(2))) // m2
    runTail(src, ckpt, sink)
    assert(ids(sink) == (1L to 20L),
      "second pass must serve ONLY the appended dir (no phantom, no reserve)")
    // nothing new: a third pass leaves the sink untouched
    val head = sink.currentId
    runTail(src, ckpt, sink)
    assert(sink.currentId == head, "an empty pass must not commit")
  }

  test("a replaced table fails the tail loudly; onReplace=skip re-baselines") {
    val src = freshDir("repl_src")
    val snk = freshDir("repl_snk")
    val ckpt = freshDir("repl_ckpt")
    val cat = new SnapshotCatalog(src)
    val sink = new SnapshotCatalog(snk)
    cat.commit(Map("t" -> facts(1, 8).repartition(4))) // m1
    runTail(src, ckpt, sink)
    assert(ids(sink) == (1L to 8L))
    // compact rewrites the dir list (a REPLACE from the tail's view)
    cat.compact(spark, "t")
    val e = intercept[Exception] { runTail(src, ckpt, sink) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("replaced")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
    // same checkpoint, skip mode: the compaction transition serves
    // nothing (already-served rows are not duplicated), later appends
    // flow again
    runTail(src, ckpt, sink, Map("onReplace" -> "skip"))
    assert(ids(sink) == (1L to 8L), "skip must not re-serve compacted rows")
    cat.append(Map("t" -> facts(9, 12))) // post-compaction append
    runTail(src, ckpt, sink, Map("onReplace" -> "skip"))
    assert(ids(sink) == (1L to 12L))
  }

  test("startSnapshotId bounds history to appends after the pinned snapshot") {
    val src = freshDir("bound_src")
    val snk = freshDir("bound_snk")
    val ckpt = freshDir("bound_ckpt")
    val cat = new SnapshotCatalog(src)
    val sink = new SnapshotCatalog(snk)
    cat.commit(Map("t" -> facts(1, 10))) // m1
    cat.append(Map("t" -> facts(11, 15))) // m2
    runTail(src, ckpt, sink, Map("startSnapshotId" -> "1"))
    assert(ids(sink) == (11L to 15L),
      "only the dirs appended after snapshot 1 may be served")
  }

  test("the graft-stream sink closes an exactly-once catalog pipe without foreachBatch") {
    val src = freshDir("sink_src")
    val snk = freshDir("sink_snk")
    val ckpt = freshDir("sink_ckpt")
    val cat = new SnapshotCatalog(src)
    val sink = new SnapshotCatalog(snk)
    def pipe(): Unit = {
      val q = spark.readStream.format("graft-stream")
        .option("path", src).option("table", "t").load()
        .writeStream.format("graft-stream")
        .option("path", snk).option("table", "t").option("writerId", "pipe")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    cat.commit(Map("t" -> facts(1, 10).repartition(2)))
    pipe()
    assert(ids(sink) == (1L to 10L))
    val head = sink.currentId
    pipe() // nothing new: the sink must not move
    assert(sink.currentId == head)
    cat.append(Map("t" -> facts(11, 15)))
    pipe()
    assert(ids(sink) == (1L to 15L))
  }

  test("default sink writerId is checkpoint-derived: distinct streams never collide in the ledger") {
    val src = freshDir("wid_src")
    val snk = freshDir("wid_snk")
    val cat = new SnapshotCatalog(src)
    val sink = new SnapshotCatalog(snk)
    cat.commit(Map("t" -> facts(1, 10)))
    def pipe(ckpt: String): Unit = {
      val q = spark.readStream.format("graft-stream")
        .option("path", src).option("table", "t").load()
        .writeStream.format("graft-stream") // NO writerId: default
        .option("path", snk).option("table", "t")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    pipe(freshDir("wid_ckpt_a"))
    // a SECOND stream (own checkpoint) tails the same source into the
    // same sink: its batch 0 must land too — a shared default ledger
    // key would silently no-op it
    pipe(freshDir("wid_ckpt_b"))
    assert(sink.snapshot().read(spark, "t").count() == 20,
      "second stream's batch was swallowed by a shared ledger key")
  }

  test("Complete mode commits a REPLACING snapshot per batch (aggregation tail)") {
    val src = freshDir("agg_src")
    val snk = freshDir("agg_snk")
    val ckpt = freshDir("agg_ckpt")
    val cat = new SnapshotCatalog(src)
    val sink = new SnapshotCatalog(snk)
    def pass(): Unit = {
      val q = spark.readStream.format("graft-stream")
        .option("path", src).option("table", "t").load()
        .groupBy().agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
        .writeStream.format("graft-stream")
        .option("path", snk).option("table", "totals").option("writerId", "agg")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    cat.commit(Map("t" -> facts(1, 10)))
    pass()
    def totals(): (Long, Long) = {
      val r = sink.snapshot().read(spark, "totals").head()
      (r.getLong(0), r.getLong(1))
    }
    assert(totals() == ((10L, 55L)))
    cat.append(Map("t" -> facts(11, 12)))
    pass() // recovered state + the new rows, REPLACING the table
    assert(totals() == ((12L, 78L)))
    assert(sink.snapshot().read(spark, "totals").count() == 1,
      "complete mode must replace, not append")
  }

  test("schema stays pinned and pushdown reaches the micro-batch scan") {
    val src = freshDir("schema_src")
    val ckpt = freshDir("schema_ckpt")
    val cat = new SnapshotCatalog(src)
    cat.commit(Map("t" -> facts(1, 5)))
    val out = new java.io.File(freshDir("schema_out"), "rows").getPath
    val q = spark.readStream.format("graft-stream")
      .option("path", src).option("table", "t").load()
      .filter(col("id") >= 3).select("id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("id"))
    assert(got.collect().map(_.getLong(0)).sorted.sameElements(Array(3L, 4L, 5L)))
  }
}
