package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TextFunctions._

/** Frequent-items sketch tier: the Misra–Gries guarantee itself, the
  * certified heavy-hitters plan against an exact in-Spark twin (the
  * DuckDB oracle re-checks it cross-engine), eviction-path exactness on
  * a skewed synthetic corpus, the certificate's failure mode, and the
  * HLL++ approx-distinct error bound vs the exact vocab_stats path.
  */
class SketchSpec extends SparkTestBase {

  test("hll_distinct matches an independent driver-side HLL replay; grain merge is lossless") {
    val rows = Sketch.hllDistinct(spark, sf).collect()
    assert(rows.length == 3)
    // independent replay: java MessageDigest md5 -> top-60-bit hash,
    // p=10 registers, raw alpha*m^2/S estimate — same math, separate code
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(v: String): Long = {
      val d = md.digest(v.getBytes("UTF-8"))
      var x = 0L
      for (i <- 0 until 8) x = (x << 8) | (d(i) & 0xffL)
      x >>> 4
    }
    val keys = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_orderkey")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byFlag = keys.groupBy(_._1)
    rows.foreach { r =>
      val flag = r.getString(0)
      val ks = byFlag(flag).map(_._2).distinct
      assert(r.getLong(1) == ks.length, s"$flag n_exact")
      val regs = new Array[Int](1024)
      ks.foreach { k =>
        val hv = h60(k.toString)
        val bucket = (hv >>> 50).toInt
        val rem = hv & ((1L << 50) - 1)
        val rho = if (rem == 0L) 51 else 51 - java.lang.Long.toBinaryString(rem).length
        if (rho > regs(bucket)) regs(bucket) = rho
      }
      val sScaled = regs.map(m => 1L << (51 - m)).sum
      val est = math.floor(0.7213 / (1.0 + 1.079 / 1024.0) *
        1048576.0 * 2251799813685248.0 / sScaled.toDouble).toLong
      assert(r.getLong(2) == est, s"$flag hll_est: got ${r.getLong(2)}, replay $est")
      // MAX-merge of per-year registers must be exactly the direct sketch
      assert(r.getLong(3) == r.getLong(2), s"$flag per-year merge not lossless")
      val ppm = math.floor(math.abs(est - ks.length).toDouble * 1000000.0 / ks.length).toLong
      assert(r.getLong(4) == ppm, s"$flag err_ppm")
    }
  }

  test("hll_union: per-source estimates equal hll_distinct's; union dominates operands") {
    val uni = Sketch.hllUnion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(uni.map(t => (t._1, t._2)).toSeq.sorted ==
      Seq(("A", "N"), ("A", "R"), ("N", "R")))
    // the per-source estimate must be the SAME number hll_distinct
    // publishes — one register algebra, two operators
    val single = Sketch.hllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    uni.foreach { case (a, b, estA, estB, estU, estI, exact, ppm) =>
      assert(estA == single(a), s"$a estimate drifted from hll_distinct")
      assert(estB == single(b), s"$b estimate drifted from hll_distinct")
      // union registers dominate each operand's pointwise -> estimate does too
      assert(estU >= estA && estU >= estB, s"($a,$b) union below an operand")
      assert(estI == estA + estB - estU)
      assert(exact > 0 &&
        ppm == math.floor(math.abs(estU - exact).toDouble * 1000000.0 / exact).toLong)
    }
  }

  test("cmsketch_eval matches a driver-side CMS replay; estimates never undercount") {
    val rows = Sketch.cmsketchEval(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 20)
    // independent replay over the collected token stream
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60mod(v: String): Int = {
      val d = md.digest(v.getBytes("UTF-8"))
      var x = 0L
      for (i <- 0 until 8) x = (x << 8) | (d(i) & 0xffL)
      ((x >>> 4) % 1024L).toInt
    }
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("t")).collect().map(_.getString(0))
    val exact = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val regs = Array.fill(4, 1024)(0L)
    toks.foreach { t =>
      for (i <- 0 until 4) regs(i)(h60mod(s"cm${i}_$t")) += 1L
    }
    def est(t: String): Long = (0 until 4).map(i => regs(i)(h60mod(s"cm${i}_$t"))).min
    rows.foreach { case (tok, cnt, _, cms, ppm) =>
      assert(cnt == exact(tok), s"$tok exact")
      assert(cms == est(tok), s"$tok cms: got $cms, replay ${est(tok)}")
      assert(cms >= cnt, s"$tok undercounts") // CMS one-sided error
      assert(ppm == math.floor((cms - cnt).toDouble * 1000000.0 / cnt).toLong)
    }
    // the one-sided guarantee holds for EVERY token, not just the top-20
    exact.foreach { case (t, c) => assert(est(t) >= c, s"$t undercounts in replay") }
  }

  test("misraGries: survivors cover every item above n/(cap+1); totals exact") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val n = 2000
      // skewed stream: a few hot items + a uniform long tail
      val stream = Seq.fill(n) {
        val r = rnd.nextInt(100)
        if (r < 30) "hot1" else if (r < 45) "hot2" else s"t${rnd.nextInt(500)}"
      }
      val cap = 8
      val out = Sketch.misraGries(stream.iterator, cap).toSeq
      val book = out.filter(_.token == null)
      assert(book.size == 1 && book.head.part_total == n.toLong)
      val survivors = out.filter(_.token != null).map(_.token).toSet
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size }
      exact.filter(_._2 > n / (cap + 1)).keys.foreach { hot =>
        assert(survivors.contains(hot), s"dropped $hot (count ${exact(hot)})")
      }
    }
  }

  test("heavy_hitters equals the exact top-20 on the test corpus") {
    val got = Sketch.heavyHitters(spark, sf)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    val exact = graft.Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 20)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exact.toSeq)
  }

  test("heavy_hitters stays exact through the eviction path (skewed corpus, tiny cap)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 200 docs: hot tokens dominate, plus a wide one-off noise tail that
    // forces decrement rounds at cap=16
    val docs = (0 until 200).map { i =>
      val hot = Seq.fill(12)(s"hot${i % 4}").mkString(" ")
      val noise = Seq.fill(6)(s"z${rnd.nextInt(5000)}").mkString(" ")
      (i.toLong, s"$hot $noise", "en", s"src${i % 3}", (hot.length + noise.length + 1).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    docs.repartition(4).write.parquet(s"$dir/documents.parquet")

    val got = Sketch.heavyHitters(spark, dir, k = 4, cap = 16)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(4).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq)
    assert(got.forall(_._1.startsWith("hot")))
  }

  test("certificate refuses an uncertifiable top-k instead of approximating") {
    // near-uniform vocabulary at a cap far below it: candidates cannot
    // cover the top-20 provably, so the call must raise, not return
    val ex = intercept[IllegalArgumentException] {
      Sketch.heavyHitters(spark, sf, k = 20, cap = 4)
    }
    assert(ex.getMessage.contains("not certifiably exact"))
  }

  test("token_freq_spectrum masses add up; HLL++ distinct within its error bound") {
    val spec = Sketch.tokenFreqSpectrum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Σ cnt * n_types == total tokens; Σ n_types == vocabulary size
    val nTok = spec.map { case (c, t) => c * t }.sum
    val nDis = spec.map(_._2).sum
    val nTokDirect = graft.Tables.documents(spark, sf)
      .select(size(tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(nTok == nTokDirect)
    assert(spec.map(_._1).distinct.length == spec.length)
    // the 100 TB shortcut: HLL++ (rsd 5%) against the exact distinct
    val approx = graft.Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("token"))
      .agg(approx_count_distinct(col("token"), 0.05)).head().getLong(0)
    assert(math.abs(approx - nDis).toDouble / nDis <= 0.15,
      s"approx=$approx exact=$nDis")
  }

  test("approx_percentile tracks exact percentile within its accuracy budget") {
    // the 100 TB swap for every exact-percentile op (group_quantiles,
    // winsorize_prices, ntile cuts): approx_percentile with a fixed
    // accuracy, mergeable across partitions. accuracy=1000 bounds the
    // rank error at n/1000; translate to a value tolerance via the
    // observed spread.
    val li = graft.Tables.lineitem(spark, sf).select(col("l_extendedprice"))
    val exact = li.agg(expr("percentile(l_extendedprice, array(0.05, 0.5, 0.95))"))
      .head().getSeq[Double](0)
    val approx = li.agg(expr(
      "approx_percentile(l_extendedprice, array(0.05, 0.5, 0.95), 1000)"))
      .head().getSeq[Double](0)
    val spread = exact.last - exact.head
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= spread * 0.02, s"exact=$e approx=$a")
    }
  }

  test("mad_outliers matches a driver-side median/MAD replay") {
    def interpMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      val m = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
      BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = MultiDim.madOutliers(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val med = interpMedian(g.map(_._2).toSeq)
      val mad = interpMedian(g.map(t => math.abs(t._2 - med)).toSeq)
      g.foreach { case (_, price, gotMed, gotMad, flagged) =>
        assert(gotMed == med && gotMad == mad, s"$flag stats: $gotMed/$gotMad vs $med/$mad")
        assert(flagged == (if (math.abs(price - med) > 4.4478 * mad) 1L else 0L))
      }
    }
    // the clamp must actually fire somewhere and not everywhere
    val n1 = rows.count(_._5 == 1L)
    assert(n1 > 0 && n1 < rows.length)
  }

  test("hist_quantiles: estimate within one bucket of the exact order statistic; registers merge by sum") {
    import org.apache.spark.sql.functions._
    val us = graft.Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 1e6).cast("long").as("u"))
      .collect().map(_.getLong(0)).sorted
    val (mn, mx, n) = (us.head, us.last, us.length.toLong)
    val span = mx - mn + 1
    val width = span / 1024 + 1
    val got = Sketch.histQuantiles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toList == List(500000L, 900000L, 990000L))
    got.foreach { case (qPpm, bucket, estU, nBelow) =>
      val target = n * qPpm / 1000000
      val exact = us(target.toInt)
      // the exact order statistic lives in the picked bucket, whose
      // width bounds the interpolation error
      assert(math.abs(estU - exact) <= width,
        s"q=$qPpm est=$estU exact=$exact width=$width")
      // n_below/cnt bracket the target rank
      assert(nBelow <= target)
      val cnt = us.count(u => (u - mn) * 1024 / span == bucket)
      assert(target < nBelow + cnt)
    }
    // merge algebra: registers of two disjoint halves sum to the
    // full-corpus registers (what a per-day / per-partition histogram
    // warehouse relies on)
    val byBucket = us.groupBy(u => (u - mn) * 1024 / span)
      .map { case (b, v) => b -> v.length.toLong }
    val (evens, odds) = us.zipWithIndex.partition(_._2 % 2 == 0)
    def regs(xs: Array[(Long, Int)]) =
      xs.map(_._1).groupBy(u => (u - mn) * 1024 / span)
        .map { case (b, v) => b -> v.length.toLong }
    val mergedRegs = (regs(evens).toSeq ++ regs(odds).toSeq)
      .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).sum }
    assert(mergedRegs == byBucket)
  }

  test("join_size_estimate: AGMS unbiased vs CM overestimate; exact equals replay") {
    val rows = Sketch.joinSizeEstimate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 4)
    val exact = rows.head._4
    // exact join size replay from the raw tables
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val od = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactReplay = ev.map { case (k, f) => f * od.getOrElse(k, 0L) }.sum
    assert(exact == exactReplay)
    // CM inner product can never underestimate the true join size
    rows.foreach { case (_, cm, _, ex, _, _) => assert(cm >= ex) }
    // cm_min / agms_med2x are consistent with the per-row columns
    assert(rows.map(_._2).min == rows.head._5)
    val sorted = rows.map(_._3).sorted
    assert(sorted(1) + sorted(2) == rows.head._6)
    // the signed estimator is unbiased: within 30% at this tiny sf
    // (at sf0.001 CM's bias |E||O|/m is comparable to AGMS's variance,
    // so no ordering claim here; the sf0.01 oracle pins exact values
    // and the measured sf0.01 gap is +155% CM vs ~6% AGMS)
    val agmsMed = rows.head._6 / 2.0
    assert(math.abs(agmsMed - exact) < 0.3 * exact + 100)
  }
}
