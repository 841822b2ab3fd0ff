package graft.operators

import graft.SparkTestBase

/** Driver-side replays for the round-6 linkage operators:
  *
  *  - cross_doc_spans — exact shared-run extraction must equal an
  *    independent in-memory islands replay (same 8-gram hash60, df
  *    band, diagonal-run merge) computed with plain Scala maps;
  *  - fuzzy_match_census — Spark's levenshtein must agree with a
  *    textbook DP edit distance over every blocked pair;
  *  - source_divergence — the nanonat JSD sum must equal a driver
  *    double replay term-for-term, and obey JSD invariants
  *    (non-negative, bounded by ln 2, symmetric by construction).
  */
class CrossDocSpec extends SparkTestBase {

  private def norm(text: String): String =
    text.replaceAll("[^a-zA-Z0-9\\s]", " ").replaceAll("\\s+", " ")
      .trim.toLowerCase

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def docs(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("cross_doc_spans equals an in-memory islands replay") {
    val K = 8
    // (doc, pos) -> gram hash, replayed with plain collections
    val grams: Seq[(Long, Int, Long)] = docs().flatMap { case (id, text, _) =>
      val w = norm(text).split(" ")
      if (w.length < K) Seq.empty
      else (0 to w.length - K).map(i =>
        (id, i, hash60(w.slice(i, i + K).mkString(" "))))
    }
    val df = grams.groupBy(_._3).map { case (h, g) =>
      h -> g.map(_._1).distinct.size
    }
    val kept = grams.filter(g => { val d = df(g._3); d >= 2 && d <= 50 })
    val byHash = kept.groupBy(_._3)
    val matches = byHash.values.flatMap { g =>
      for (a <- g; b <- g; if a._1 < b._1) yield ((a._1, b._1), (a._2, b._2))
    }.toSeq
    val expected = matches.groupBy(_._1).map { case ((da, db), ps) =>
      val runs = ps.map(_._2).groupBy { case (pa, pb) => pa - pb }
        .values.flatMap { diag =>
          val sorted = diag.map(_._1).sorted
          // islands: split where consecutive positions break
          sorted.zipWithIndex.groupBy { case (p, i) => p - i }
            .values.map(_.size)
        }.toSeq
      (da, db) -> ((runs.size.toLong, runs.max.toLong + (K - 1), runs.sum.toLong))
    }

    val got = Dedup.crossDocSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty, "corpus should contain cross-doc duplicate spans")
    assert(got == expected)
    // every reported span is at least one full gram window
    assert(got.values.forall { case (ns, mx, sh) => mx >= K && sh >= ns })
  }

  test("span_coverage_incremental equals an in-memory membership replay") {
    val K = 8
    val all = docs().map { case (id, text, _) => (id, norm(text).split(" ")) }
    def gramsOf(w: Array[String]): Seq[(Int, Long)] =
      if (w.length < K) Seq.empty
      else (0 to w.length - K).map(i => (i, hash60(w.slice(i, i + K).mkString(" "))))
    val isBatch = (id: Long) => id % 7 == 3
    val corpusSet = all.filterNot(d => isBatch(d._1))
      .flatMap(d => gramsOf(d._2).map(_._2)).toSet
    val expected = all.filter(d => isBatch(d._1)).map { case (id, w) =>
      val covered = gramsOf(w)
        .filter(g => corpusSet.contains(g._2))
        .flatMap { case (p, _) => p until (p + K) }.distinct.size.toLong
      id -> ((w.length.toLong, covered,
        1000000L * covered / w.length))
    }.toMap
    val got = Dedup.spanCoverageIncremental(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "some batch doc must have corpus coverage")
    // coverage never exceeds the doc
    assert(got.values.forall { case (n, c, _) => c <= n })
  }

  test("dup_span_rewrite equals an in-memory rewrite replay") {
    val K = 8
    val all = docs().map { case (id, text, _) => (id, norm(text).split(" ")) }
    def gramsOf(w: Array[String]): Seq[(Int, Long)] =
      if (w.length < K) Seq.empty
      else (0 to w.length - K).map(i => (i, hash60(w.slice(i, i + K).mkString(" "))))
    val df = all.flatMap { case (id, w) => gramsOf(w).map(g => (g._2, id)) }
      .groupBy(_._1).map { case (h, v) => h -> v.map(_._2).distinct.size }
    val expected = all.map { case (id, w) =>
      val covered = gramsOf(w).filter(g => df(g._2) > 1)
        .flatMap { case (p, _) => p until (p + K) }.toSet
      val keptToks = w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      val fp = if (keptToks.isEmpty) null
        else java.security.MessageDigest.getInstance("MD5")
          .digest(keptToks.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      id -> ((w.length.toLong, keptToks.length.toLong, fp))
    }.toMap
    val got = Dedup.dupSpanRewrite(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(got == expected)
    assert(got.values.exists { case (n, k, _) => k < n },
      "some doc must actually lose covered spans")
  }

  test("dedup_channel_overlap: per-channel masses equal the channel operators' pair counts") {
    val rows = Dedup.dedupChannelOverlap(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.keySet.forall(m => m >= 1 && m <= 7))
    def channelMass(bit: Long) =
      rows.collect { case (m, n) if (m & bit) != 0 => n }.sum
    assert(channelMass(1) == Dedup.dedupMinhashLsh(spark, sf).count())
    assert(channelMass(2) == Dedup.dedupContainment(spark, sf).count())
    assert(channelMass(4) == Dedup.crossDocSpans(spark, sf).count())
  }

  test("fuzzy_match_census: Spark levenshtein equals textbook DP over all blocked pairs") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text", "n_chars").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1),
        norm(r.getString(2)).take(48), r.getLong(3) / 16))
    val expected = base.groupBy(_._2).map { case (src, rows) =>
      val pairs = for {
        a <- rows; b <- rows
        if a._1 < b._1 && a._4 == b._4
      } yield lev(a._3, b._3)
      src -> ((rows.size.toLong, rows.map(_._4).distinct.size.toLong,
        pairs.size.toLong, pairs.count(_ <= 24).toLong,
        if (pairs.isEmpty) null else pairs.min.toLong))
    }
    val got = Dedup.fuzzyMatchCensus(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    assert(got == expected)
    assert(got.values.map(_._3).sum > 0, "blocked pairs must exist")
  }

  test("source_divergence equals a driver double replay and obeys JSD bounds") {
    val tf = docs().flatMap { case (_, text, src) =>
      norm(text).split(" ").map(t => (src, t))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot = tf.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val vocab = tf.keySet.map(_._2)
    val sources = tot.keySet.toSeq.sorted
    val expected = (for {
      sa <- sources; sb <- sources; if sa < sb
    } yield {
      var nanos = 0L; var ov = 0L
      for (t <- vocab) {
        val ca = tf.getOrElse((sa, t), 0L); val cb = tf.getOrElse((sb, t), 0L)
        val pa = ca.toDouble / tot(sa); val pb = cb.toDouble / tot(sb)
        val term = (if (ca > 0) 0.5 * pa * math.log(2.0 * pa / (pa + pb)) else 0.0) +
          (if (cb > 0) 0.5 * pb * math.log(2.0 * pb / (pa + pb)) else 0.0)
        nanos += math.round(term * 1e9)
        if (ca > 0 && cb > 0) ov += 1
      }
      (sa, sb) -> ((ov, nanos))
    }).toMap

    val got = CorpusAnalytics.sourceDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // JSD in [0, ln 2]; per-pair rounding error bounded by vocab size
    val lnTwoNanos = math.round(math.log(2.0) * 1e9)
    assert(got.values.forall { case (_, n) =>
      n >= -vocab.size && n <= lnTwoNanos + vocab.size
    })
  }
}
