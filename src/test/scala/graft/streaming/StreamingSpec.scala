package graft.streaming

import graft.SparkTestBase
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The streaming hourly aggregation must agree with its batch twin on
  * a static landing directory.
  */
class StreamingSpec extends SparkTestBase {

  test("streaming hourly agg == batch event_window_agg") {
    val streamed = StreamingOps.runOnce(spark, sf, "stream_hourly")
    val batch = Relational.eventWindowAgg(spark, sf)
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("bucket", "event_type"), "full")
      .filter(streamed("n") =!= batch("n") ||
        abs(streamed("sum_value") - batch("sum_value")) > 1e-6)
    assert(diff.count() == 0)
  }

  test("stateful mapGroupsWithState running stats == batch groupBy") {
    val streamed = StreamingOps.runUserStatsOnce(spark, sf, "stream_user_stats")
    val batch = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(expr("coalesce(value, 0.0)")).as("sum_value"),
        max(expr("CAST(unix_timestamp(ts) AS LONG)")).as("last_seen"))
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("user_id"), "full")
      .filter(streamed("n") =!= batch("n") ||
        abs(streamed("sum_value") - batch("sum_value")) > 1e-6 ||
        streamed("last_seen") =!= batch("last_seen"))
    assert(diff.count() == 0)
  }

  /** Pin streamed gap sessions == batch truth over any table dir.
    * Batch truth: per-event session seq -> per-session aggregates,
    * excluding each user's LAST session unless its gap timeout already
    * fell behind the 2h watermark (AvailableNow runs the timeout batch,
    * so only final sessions still inside the horizon stay open).
    */
  private def assertGapSessionTwin(dir: String, queryName: String): Unit = {
    val streamed = StreamingOps.runGapSessionsOnce(spark, dir, queryName)
    val seq = graft.operators.Relational.eventsSessionize(spark, dir)
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("event_id", "coalesce(value, 0.0) AS v")
    val sessions = seq.join(ev, "event_id")
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min("epoch_s").as("start_s"), max("epoch_s").as("end_s"),
        count(lit(1)).as("n_events"), sum("v").as("sum_value"))
    val lastSeq = sessions.groupBy("user_id")
      .agg(max("session_seq").as("last_seq"))
    val maxEpoch = graft.Tables.events(spark, dir)
      .agg(max(expr("CAST(unix_timestamp(ts) AS LONG)"))).head().getLong(0)
    val closedBatch = sessions.join(lastSeq, "user_id")
      .filter(col("session_seq") =!= col("last_seq") ||
        col("end_s") + 1800 < lit(maxEpoch - 7200))
      .select(col("user_id"), col("start_s"), col("end_s"),
        col("n_events"), round(col("sum_value"), 6).as("sum_value"))
    val streamedNorm = streamed.select(col("user_id"), col("start_s"),
      col("end_s"), col("n_events"), round(col("sum_value"), 6).as("sum_value"))
    assert(streamedNorm.count() == closedBatch.count())
    assert(streamedNorm.exceptAll(closedBatch).count() == 0)
    assert(closedBatch.exceptAll(streamedNorm).count() == 0)
  }

  test("flatMapGroupsWithState gap sessions == batch sessionize (closed sessions)") {
    assertGapSessionTwin(sf, "stream_sessions")
  }

  test("streaming funnel state machine == batch funnel_steps") {
    val streamed = StreamingOps.runFunnelOnce(spark, sf, "stream_funnel")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("depth"))
    val batch = graft.operators.Temporal.funnelSteps(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("foreachBatch parquet sink: durable output == batch, restart-idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    StreamingOps.runHourlyToParquet(spark, sf, out, ckpt)
    val batch = Relational.eventWindowAgg(spark, sf)
    def readBack = spark.read.parquet(out)
      .select(col("bucket"), col("event_type"), col("n"), col("sum_value"))
    assert(readBack.count() == batch.count())
    assert(readBack.exceptAll(batch).count() == 0)
    // re-running against the same checkpoint replays nothing and leaves
    // the durable output unchanged (idempotent restart)
    StreamingOps.runHourlyToParquet(spark, sf, out, ckpt)
    assert(readBack.count() == batch.count())
    assert(readBack.exceptAll(batch).count() == 0)
  }

  test("stream-stream attribution join == batch interval join") {
    val streamed = StreamingOps.runAttributionOnce(spark, sf, "stream_attr")
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("us").as("cus"))
    val batch = ev.filter(col("event_type") === "purchase")
      .join(clicks, col("user_id") === col("cu") &&
        col("cus") >= col("us") - 3600000000L && col("cus") <= col("us"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"), (col("us") - col("cus")).as("gap_us"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) == batch distinct") {
    val streamed = StreamingOps.runDedupOnce(spark, sf, "stream_dedup")
    val batch = graft.Tables.events(spark, sf)
    assert(streamed.count() ==
      batch.select(col("user_id"), col("event_type"), col("value"))
        .distinct().count())
    // output keys are unique and every kept row exists in the source
    val perKey = spark.table("stream_dedup")
      .groupBy(col("user_id"), col("event_type"), col("value")).count()
      .filter(col("count") > 1)
    assert(perKey.count() == 0)
  }

  test("gap sessions twin holds on the ScaleUp (3x) corpus") {
    // guards the stateful path against scale-dependent bugs: 3x users,
    // per-replica user_id offsets, identical timestamp range
    val scaled = java.nio.file.Files.createTempDirectory("graft_sess_sf3").toString
    graft.ScaleUp.run(spark, sf, scaled, 3)
    assertGapSessionTwin(scaled, "stream_sessions_sf3")
  }

  test("streaming quality gate == the same gate over a batch scan") {
    // the native-kernel curation signals are stateless, so the stream
    // over landing files must produce exactly the batch rows
    val streamed = StreamingOps.runQualityGateOnce(spark, sf, "stream_qgate")
    val batch = StreamingOps.qualityGate(graft.Tables.documents(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming intra-doc dedup == the batch rewrite (stats and deltas)") {
    // stateless per-doc rewrite: the landing stream must produce the
    // exact batch result, including the NULL-delta rows
    val streamed = StreamingOps.runIntradocOnce(spark, sf, "stream_intradoc")
    val batch = graft.operators.TextAnalysis.intradocDedup(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming CUSUM daily counts == batch; composed CUSUM readout == cusum_drift") {
    val streamed = StreamingOps.runCusumOnce(spark, sf, "stream_cusum")
    val batch = graft.operators.Temporal
      .dailyCounts(graft.Tables.events(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // the monitor's per-trigger readout: CUSUM over the streamed state
    // table must equal the registered batch operator exactly
    val composed = graft.operators.Temporal.cusum(streamed).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4))).toSet
    val full = graft.operators.Temporal.cusumDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4))).toSet
    assert(composed == full)
  }

  test("streaming monthly revenue lane == batch; composed OLS readout == ols_trend") {
    val streamed = StreamingOps.runOlsOnce(spark, sf, "stream_ols")
    val batch = graft.operators.Temporal.monthlyRevenueCents(
      graft.Tables.orders(spark, sf), graft.Tables.customer(spark, sf),
      graft.Tables.nation(spark, sf))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    val composed = graft.operators.Temporal.ols(streamed).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    val full = graft.operators.Temporal.olsTrend(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(composed == full)
  }

  test("streaming chunk pair-counts == batch; composed spectrum readout == content_chunk_dedup") {
    val streamed = StreamingOps.runContentChunkOnce(spark, sf, "stream_chunks")
    val batch = graft.operators.Dedup.chunkPairCounts(
      graft.Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    val composed = graft.operators.Dedup.chunkSpectrum(streamed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = graft.operators.Dedup.contentChunkDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(composed == full)
  }

  test("streaming drift counts == the batch lane aggregation") {
    // sum-mergeable count state: the stream's final complete-mode
    // table must equal the batch scan's count table exactly
    val streamed = StreamingOps.runDriftOnce(spark, sf, "stream_drift")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.operators.Profile
      .driftCounts(graft.Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-static importance scoring == batch importance_resample") {
    // the static contrast model is trained on the same corpus the
    // stream lands, so scores/weights/accepts must match exactly
    val streamed = StreamingOps.runImportanceOnce(spark, sf, "stream_importance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.TrainPrep.importanceResample(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-static incremental dedup == batch dedup_incremental (matched subset)") {
    val streamed = StreamingOps
      .runIncrementalDedupOnce(spark, sf, "stream_incr_dedup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val batch = graft.operators.Dedup.dedupIncremental(spark, sf)
      .filter(col("n_matches") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-static incremental containment == batch containment_incremental (matched subset)") {
    val streamed = StreamingOps
      .runIncrementalContainmentOnce(spark, sf, "stream_incr_containment")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val batch = graft.operators.Dedup.containmentIncremental(spark, sf)
      .filter(col("n_matches") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming join-size registers == batch estimator (single and multi-batch)") {
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.operators.Sketch.joinSizeEstimate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty)
    val single = asMap(StreamingOps.runJoinSizeOnce(spark, sf, "jsz_single"))
    assert(single == batch)
    // multi-batch: register state folds across 4 one-file triggers
    val dir = "target/stream_jsz_multi"
    graft.Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(graft.Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val multi = asMap(StreamingOps.runJoinSize(spark, src, sf, "jsz_multi"))
    assert(multi == batch)
  }

  test("stream-static span coverage == batch span_coverage_incremental (matched subset)") {
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = asSet(graft.operators.Dedup.spanCoverageIncremental(spark, sf)
      .filter(col("covered_tokens") > 0))
    assert(batch.nonEmpty)
    // single batch
    val single = asSet(StreamingOps.runSpanCoverageOnce(spark, sf, "span_cov_single"))
    assert(single == batch)
    // multi-batch: 4 files, one per trigger — per-doc covered-position
    // sets accumulate in update-mode state; final rows must still match
    val dir = "target/stream_spancov_multi"
    graft.Tables.documents(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(graft.Tables.documents(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val multi = asSet(StreamingOps.runSpanCoverage(spark, src, sf, "span_cov_multi"))
    assert(multi == batch)
  }

  test("streaming anomaly monitor == batch anomaly_days (single and multi-batch)") {
    def batchSet = graft.operators.Temporal.anomalyDays(spark, sf).collect()
      .map(r => (r.getString(0),
        r.getDate(1).toLocalDate.toEpochDay * 86400L,
        r.getLong(2), r.getBoolean(3))).toSet
    def streamSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val expected = batchSet
    assert(expected.nonEmpty)
    // single batch
    val single = streamSet(StreamingOps.runAnomalyOnce(spark, sf, "anomaly_single"))
    assert(single == expected)
    // multi-batch: 4 files, one per trigger — daily counts accumulate
    // across triggers and the final flags must still match batch
    val dir = "target/stream_anomaly_multi"
    graft.Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(graft.Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val multiDf = StreamingOps.runAnomalyOnce(spark, sf, "anomaly_multi", src)
    assert(spark.table("anomaly_multi")
      .agg(max(col("seq"))).head.getLong(0) >= 2) // state genuinely carried
    assert(streamSet(multiDf) == expected)
  }

  test("streaming HLL registers == driver replay, single- and multi-batch") {
    // independent replay: same md5-top-60-bit hash, p=10 registers,
    // raw alpha*m^2/S estimate — no shared code with the twin under test
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(v: String): Long = {
      val d = md.digest(v.getBytes("UTF-8"))
      var x = 0L
      for (i <- 0 until 8) x = (x << 8) | (d(i) & 0xffL)
      x >>> 4
    }
    val expected = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (et, rows) =>
        val regs = new Array[Int](1024)
        rows.map(_._2).foreach { uid =>
          val hv = h60(uid.toString)
          val rem = hv & ((1L << 50) - 1)
          val rho = if (rem == 0L) 51
            else 51 - java.lang.Long.toBinaryString(rem).length
          val b = (hv >>> 50).toInt
          if (rho > regs(b)) regs(b) = rho
        }
        val sScaled = regs.map(m => 1L << (51 - m)).sum
        val est = math.floor(0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 *
          2251799813685248.0 / sScaled.toDouble).toLong
        (et, sScaled, est)
      }.toSet
    assert(expected.nonEmpty)
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got(StreamingOps.runHllOnce(spark, sf, "hll_single")) == expected)
    // multi-batch: 4 files, one per trigger — registers must MAX-merge
    // across triggers to the same final state
    val dir = "target/stream_hll_multi"
    graft.Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(graft.Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val multi = StreamingOps.runHllOnce(spark, sf, "hll_multi", src)
    assert(spark.table("hll_multi")
      .agg(max(col("seq"))).head.getLong(0) >= 2) // state genuinely carried
    assert(got(multi) == expected)
  }

  test("streaming CMS registers == batch registers, single- and multi-batch") {
    // batch truth: an independent driver-side register build
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .collect().map(_.getString(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60mod(v: String): Int = {
      val d = md.digest(v.getBytes("UTF-8"))
      var x = 0L
      for (i <- 0 until 8) x = (x << 8) | (d(i) & 0xffL)
      ((x >>> 4) % 1024L).toInt
    }
    val regs = Array.fill(4, 1024)(0L)
    toks.foreach { t => for (i <- 0 until 4) regs(i)(h60mod(s"cm${i}_$t")) += 1L }
    val expected = (0 until 4).map { i =>
      var ck = 0L
      regs(i).foreach(v => ck = ck * 1000003L + v)
      (i, regs(i).sum, ck)
    }.toSet
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got(StreamingOps.runCmsOnce(spark, sf, "cms_single")) == expected)
    // multi-batch: registers must SUM-merge across triggers
    val dir = "target/stream_cms_multi"
    graft.Tables.documents(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(graft.Tables.documents(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val multi = StreamingOps.runCmsOnce(spark, sf, "cms_multi", src)
    assert(spark.table("cms_multi")
      .agg(max(col("seq"))).head.getLong(0) >= 2)
    assert(got(multi) == expected)
  }

  test("streaming MG sketch carries state across micro-batches (multi-file source)") {
    // single-file sources collapse AvailableNow into one batch, which
    // never exercises the state carry — split the corpus into 4 files
    // and feed them one per trigger
    val dir = "target/stream_mg_multi"
    graft.Tables.documents(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val docsStream = spark.readStream
      .schema(graft.Tables.documents(spark, sf).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingOps.heavyHittersStream(docsStream).writeStream
      .outputMode("update").format("memory").queryName("mg_multi")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val t = spark.table("mg_multi")
    // state genuinely carried: some shard was updated in >= 2 triggers
    assert(t.agg(max(col("seq"))).head.getLong(0) >= 2)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
    val out = t.withColumn("__mx", max(col("seq")).over(w))
      .filter(col("seq") === col("__mx")).drop("__mx").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val exact = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .select(col("token"),
        pmod(graft.functions.TextFunctions.hash60(col("token")), lit(8))
          .cast("int").as("shard"))
      .groupBy(col("shard"), col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val shardTotals = exact.groupBy(_._1._1).map { case (s2, m) => s2 -> m.values.sum }
    // invariants survive the batch split: full mass observed, no
    // overestimates, eviction-bounded error
    out.groupBy(_._1).foreach { case (s2, rows) =>
      assert(rows.map(_._4).toSet == Set(shardTotals(s2)))
    }
    out.foreach { case (s2, tk, est, _, ev) =>
      val ex = exact((s2, tk))
      assert(est <= ex && ex - est <= ev, s"bound violated for ($s2,$tk)")
    }
  }

  test("streaming Misra-Gries sketch honors the MG guarantees vs exact counts") {
    val out = StreamingOps.runHeavyHittersOnce(spark, sf, "stream_mg").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // exact per-token counts and shard assignment, computed batch-side
    val exact = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .select(col("token"),
        pmod(graft.functions.TextFunctions.hash60(col("token")), lit(8))
          .cast("int").as("shard"))
      .groupBy(col("shard"), col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val shardTotals = exact.groupBy(_._1._1).map { case (s2, m) => s2 -> m.values.sum }
    val cap = 64L
    // (1) shard totals observed by the stream match the exact mass
    out.groupBy(_._1).foreach { case (s2, rows) =>
      assert(rows.map(_._4).toSet == Set(shardTotals(s2)))
    }
    // (2) no overestimates, and underestimates bounded by the shard's
    // eviction rounds (each round subtracts at most 1 per counter)
    out.foreach { case (s2, t, est, _, ev) =>
      val ex = exact((s2, t))
      assert(est <= ex, s"overestimate for ($s2,$t)")
      assert(ex - est <= ev, s"error beyond eviction bound for ($s2,$t)")
    }
    // (3) completeness: any token with count > shard_total/(cap+1) is
    // guaranteed to survive in its shard's summary
    val present = out.map(r => (r._1, r._2)).toSet
    exact.foreach { case ((s2, t), n) =>
      if (n > shardTotals(s2) / (cap + 1))
        assert(present((s2, t)), s"guaranteed heavy hitter ($s2,$t,$n) missing")
    }
  }
}