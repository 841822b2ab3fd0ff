package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariant checks for the training-prep operators; the value-level
  * gate is the DuckDB oracle (oracleSql entries), these pin the
  * semantic properties that survive any corpus.
  */
class TrainPrepSpec extends SparkTestBase {

  test("unigram_lm_score: nll positive and bounded by ln(T)") {
    val r = TrainPrep.unigramLmScore(spark, sf).cache()
    // every token probability is in (0, 1]: cnt >= 1 and cnt <= T, so
    // 0 <= avg_nll <= ln(T)
    val t = r.agg(sum(col("n_tokens"))).head.getLong(0).toDouble
    val bad = r.filter(col("avg_nll") < -1e-6 ||
      col("avg_nll") > math.log(t) + 1e-6).count()
    assert(bad === 0)
    assert(r.count() > 0)
    r.unpersist()
  }

  test("unigram_lm_score: a doc of rare tokens scores above a doc of common ones") {
    // the corpus-level signal the filter exists for: higher count ->
    // lower per-token nll, so docs dominated by frequent terms must
    // score below the corpus max
    val r = TrainPrep.unigramLmScore(spark, sf).cache()
    val mn = r.agg(min(col("avg_nll"))).head.getDouble(0)
    val mx = r.agg(max(col("avg_nll"))).head.getDouble(0)
    assert(mx > mn) // non-degenerate spread
    r.unpersist()
  }

  test("dup_span_detect: dup counts bounded by span counts, ppm consistent") {
    val r = TrainPrep.dupSpanDetect(spark, sf).cache()
    val bad = r.filter(col("n_dup_spans") > col("n_spans") ||
      col("n_dup_spans") < 0 ||
      col("dup_span_ppm") =!= floor(lit(1000000.0) * col("n_dup_spans") / col("n_spans")).cast("long"))
      .count()
    assert(bad === 0)
    // only docs with >= 8 tokens appear
    assert(r.count() > 0)
    r.unpersist()
  }

  test("dup_span_detect: a duplicated doc pair flags all spans on both sides") {
    import spark.implicits._
    // two identical docs + one unique: every span of the twins is a
    // cross-doc dup, the unique doc has zero
    val dir = java.nio.file.Files.createTempDirectory("dupspan").toString
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    Seq((1L, words), (2L, words), (3L, (1 to 12).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TrainPrep.dupSpanDetect(spark, dir).cache()
    val twins = r.filter(col("doc_id") <= 2)
    assert(twins.filter(col("n_dup_spans") =!= col("n_spans")).count() === 0)
    assert(twins.head.getLong(1) === 5) // 12 tokens -> 5 8-gram spans
    assert(r.filter(col("doc_id") === 3).head.getLong(2) === 0)
    r.unpersist()
  }

  test("global_shuffle: every doc exactly once, shards bounded, positions dense") {
    val r = TrainPrep.globalShuffle(spark, sf).cache()
    val n = r.count()
    assert(r.select(col("doc_id")).distinct().count() === n)
    assert(r.filter(col("shard") < 0 || col("shard") >= 32).count() === 0)
    // positions are 1..count(shard) dense within each shard
    val bad = r.groupBy(col("shard"))
      .agg(count(lit(1)).as("c"), max(col("shard_pos")).as("mx"),
        min(col("shard_pos")).as("mn"))
      .filter(col("mx") =!= col("c") || col("mn") =!= 1)
      .count()
    assert(bad === 0)
    r.unpersist()
  }

  test("global_shuffle: deterministic across partitionings") {
    val a = TrainPrep.globalShuffle(spark, sf)
    val b = TrainPrep.globalShuffle(spark, sf).repartition(7)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("bpe_merge_step: equals driver-side pair counting; ordering total") {
    val got = TrainPrep.bpeMergeStep(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 20)
    // n non-increasing, pair-asc tiebreak
    got.sliding(2).foreach {
      case Array((pa, na), (pb, nb)) => assert(na > nb || (na == nb && pa < pb))
      case _ => ()
    }
    // naive recount on the collected token stream
    val toks = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("t"))
      .collect().map(_.getString(0)).filter(_.length >= 2)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    toks.foreach { t =>
      (0 until t.length - 1).foreach { i =>
        val p = t.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1L
      }
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expect)
  }

  test("corpus_profile: one row, internally consistent") {
    val r = TrainPrep.corpusProfile(spark, sf).cache()
    assert(r.count() === 1)
    val row = r.head
    val nDocs = row.getAs[Long]("n_docs")
    val nTokens = row.getAs[Long]("n_tokens")
    assert(nDocs > 0 && nTokens >= nDocs) // every doc has >= 1 token slot
    assert(row.getAs[Long]("vocab_size") > 0)
    assert(row.getAs[Long]("en_ppm") >= 0 && row.getAs[Long]("en_ppm") <= 1000000)
    assert(row.getAs[Long]("avg_doc_len_micro") ===
      math.floor(1e6 * nTokens / nDocs).toLong)
    r.unpersist()
  }

  test("quality_classifier: prob in (0,1), keep_flag consistent with 0.5") {
    val r = TrainPrep.qualityClassifier(spark, sf).cache()
    val bad = r.filter(col("quality_prob") <= 0 || col("quality_prob") >= 1)
      .count()
    assert(bad === 0)
    // logit > 0 <=> sigmoid > 0.5 (rounded value can sit exactly at
    // 0.5 only when |logit| < 1e-6; allow that sliver)
    val inconsistent = r.filter(
      (col("keep_flag") === 1 && col("quality_prob") < 0.4999995) ||
        (col("keep_flag") === 0 && col("quality_prob") > 0.5000005)).count()
    assert(inconsistent === 0)
    r.unpersist()
  }

  test("train_split: near-dup clusters never straddle a split boundary") {
    val split = TrainPrep.trainSplit(spark, sf).cache()
    // leakage invariant: every member of an LSH near-dup cluster keys
    // its split off the same cluster label -> one split per cluster
    val clusters = Dedup.dedupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
    val straddling = split.join(clusters, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"),
        countDistinct(col("split_key")).as("n_keys"))
      .filter(col("n_splits") =!= 1 || col("n_keys") =!= 1)
      .count()
    assert(straddling === 0)
    // every document is assigned exactly one split, and the 90/5/5
    // hash split is non-degenerate on this corpus
    val total = split.count()
    assert(total === graft.Tables.documents(spark, sf).count())
    val bySplit = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train").toDouble / total > 0.7)
    split.unpersist()
  }

  test("global_ordinals: contiguous permutation consistent with the total order") {
    val r = TrainPrep.globalOrdinals(spark, sf).cache()
    val n = r.count()
    assert(r.agg(min(col("ordinal"))).head.getLong(0) === 0L)
    assert(r.agg(max(col("ordinal"))).head.getLong(0) === n - 1)
    assert(r.select(col("ordinal")).distinct().count() === n)
    // driver-side replay of the total order (n_chars desc, doc_id asc)
    val sorted = r.collect()
      .sortBy(x => (-x.getAs[Long]("n_chars"), x.getAs[Long]("doc_id")))
    assert(sorted.zipWithIndex.forall {
      case (row, i) => row.getAs[Long]("ordinal") == i.toLong
    })
    r.unpersist()
  }

  test("bigram_lm_score: equals exact driver replay; strictly positive") {
    def toks(t: String): Array[String] =
      t.replaceAll("[^a-zA-Z0-9\\s]", " ").replaceAll("\\s+", " ")
        .trim.toLowerCase.split(" ")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
      .filter(_._2.length >= 2)
    val docBgs = docs.map { case (id, w) =>
      (id, w.length.toLong, w.sliding(2).map(_.mkString(" ")).toSeq)
    }
    val cbg = docBgs.flatMap(_._3).groupBy(identity)
      .map { case (g, v) => (g, v.length.toLong) }
    val c1 = cbg.toSeq.groupBy(_._1.split(" ")(0))
      .map { case (t, v) => (t, v.map(_._2).sum) }
    val vocabV = c1.size.toLong
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-bigram nanonat term (HALF_UP), per-occurrence exact long sum
    // — the engines' order-free integer lane
    val termN = cbg.map { case (g, n) =>
      val term = math.log((c1(g.split(" ")(0)) + vocabV).toDouble) -
        math.log((n + 1).toDouble)
      (g, BigDecimal(term * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val expected = docBgs.map { case (id, dl, bgs) =>
      val sn = bgs.map(termN).sum
      (id, dl, r6(sn.toDouble / 1e9 / (dl - 1)))
    }.toSet
    val got = TrainPrep.bigramLmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // add-one smoothing: ln(c1+V) > ln(cbg+1) since c1 >= cbg, V >= 1
    got.foreach { case (_, _, nll) => assert(nll > 0) }
  }

  test("nb_domain_attribution: equals NB driver replay; census masses conserve") {
    def toks(t: String): Array[String] =
      t.replaceAll("[^a-zA-Z0-9\\s]", " ").replaceAll("\\s+", " ")
        .trim.toLowerCase.split(" ")
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), hash60(r.getString(1)) % 4, toks(r.getString(2))))
    val cnt = docs.flatMap { case (_, dm, w) => w.map(t => (dm, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tot = cnt.groupBy(_._1._1).map { case (dm, m) => dm -> m.values.sum }
    val vocab = cnt.keySet.map(_._2)
    val vocabV = vocab.size.toLong
    def nllN(dm: Long, t: String): Long = {
      val term = math.log((tot(dm) + vocabV).toDouble) -
        math.log((cnt.getOrElse((dm, t), 0L) + 1L).toDouble)
      BigDecimal(term * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = docs.map { case (_, dmTrue, w) =>
      val tf = w.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      val pred = (0L until 4L).map(dm =>
        (tf.map { case (t, f) => f * nllN(dm, t) }.sum, dm)).min._2
      (dmTrue, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = TrainPrep.nbDomainAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // every doc is classified exactly once
    assert(got.values.sum == docs.length.toLong)
  }

  test("heldout_nll: only odd docs scored; nll bounded by the OOV penalty; OOV counted") {
    import graft.functions.TextFunctions
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val trainToks = docs.filter(_._1 % 2 == 0).flatMap(_._2)
    val vocab = trainToks.toSet
    val (t, v) = (trainToks.length.toLong, vocab.size.toLong)
    val oovNll = math.log((t + v).toDouble) / 1  // per OOV token, in nats
    val rows = TrainPrep.heldoutNll(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == docs.filter(_._1 % 2 == 1).map(_._1).toSet)
    rows.foreach { case (id, n, nOov, avg) =>
      // every per-token NLL is in (0, ln(T+V)]: the mean is too
      assert(avg > 0 && avg <= oovNll + 1e-6, s"doc $id avg_nll $avg")
      // OOV census equals a direct set check
      val expOov = docs.find(_._1 == id).get._2.count(!vocab.contains(_))
      assert(nOov == expOov.toLong && n == docs.find(_._1 == id).get._2.length)
    }
  }

  test("importance_resample equals a driver-side contrast-lane replay") {
    import graft.functions.TextFunctions
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        (pmod(graft.functions.Hash60.hash60(col("source")), lit(4L)) === 0L)
          .as("tgt"),
        TextFunctions.tokens(col("text")).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getSeq[String](2)))
    assert(docs.exists(_._2) && docs.exists(!_._2), "both pops present")
    val tc = scala.collection.mutable.Map.empty[String, Long]
    val rc = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, tgt, toks) =>
      toks.foreach { t =>
        rc(t) = rc.getOrElse(t, 0L) + 1
        if (tgt) tc(t) = tc.getOrElse(t, 0L) + 1
      }
    }
    val (tt, rt) = (tc.values.sum, rc.values.sum)
    val expected = docs.flatMap { case (id, _, toks) =>
      val dl = toks.length.toLong
      val sw = toks.map(t =>
        tc.getOrElse(t, 0L) * 1000000L / tt - rc(t) * 1000000L / rt).sum
      val score = (sw + dl * 1000000L) / dl - 1000000L
      val w = math.min(1000000L, math.max(0L, 500000L + 100L * score))
      val draw = graft.functions.Hash60.md5Hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString("rs" + id)) % 1000000L
      if (draw < w) Some(id -> (score, w)) else None
    }.toMap
    val got = TrainPrep.importanceResample(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("temperature_mixture: budget conserved, tau<1 flattens head into tail, tau=1 proportional") {
    val rows = TrainPrep.temperatureMixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length >= 2)
    // each tau's allocations sum to the 1M budget minus at most one
    // integer-division remainder per language
    Seq[((String, Long, Long, Long, Long, Long)) => Long](
      _._3, _._4, _._5, _._6).foreach { c =>
      val s = rows.map(c).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"allocation sum $s out of budget band")
    }
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    // flattening is monotone in tau for the extremes
    assert(head._3 < head._4 && head._4 < head._5 && head._5 < head._6,
      s"head language must gain allocation as tau rises: $head")
    assert(tail._3 > tail._4 && tail._4 > tail._5 && tail._5 > tail._6,
      s"tail language must lose allocation as tau rises: $tail")
    // tau=1 is proportional sampling: allocation per doc equal across
    // languages up to integer rounding
    val perDoc = rows.map(r => r._6.toDouble / r._2)
    assert(perDoc.max - perDoc.min < 0.05 * perDoc.max,
      s"tau=1 must be ~proportional: $perDoc")
    // every language keeps a nonzero allocation at the flattest tau
    assert(rows.forall(_._3 > 0L))
  }
}
