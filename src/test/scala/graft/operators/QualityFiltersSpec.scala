package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariant checks for the corpus quality/curation operators; the
  * value-level gate is the DuckDB oracle (oracleSql entries), these
  * pin the semantic properties that survive any corpus.
  */
class QualityFiltersSpec extends SparkTestBase {

  // NOTE: every test materializes with .cache() BEFORE filtering —
  // a predicate on the raw plan gets pushed below the projections,
  // substituting the full expression trees into the nested lambdas
  // (normText re-evaluated per array element; measured: char_entropy's
  // invariant filter went from <1 s cached to >14 min pushed-down).

  test("repetition_filter: ppm bounded, flag consistent with thresholds") {
    val r = QualityFilters.repetitionFilter(spark, sf).cache()
    val bad = r.filter(
      col("top_word_ppm") < 0 || col("top_word_ppm") > 1000000 ||
        col("dup_bigram_ppm") < 0 || col("dup_bigram_ppm") > 1000000 ||
        col("dup_trigram_ppm") < 0 || col("dup_trigram_ppm") > 1000000 ||
        (col("passes_repetition") === 1) =!=
          (col("top_word_ppm") <= 200000 && col("dup_trigram_ppm") <= 300000))
      .count()
    assert(bad === 0)
    assert(r.count() > 0)
    r.unpersist()
  }

  test("pii_redact: injected PII is found and fully scrubbed") {
    val r = QualityFilters.piiRedact(spark, sf).cache()
    // every doc_id % 7 == 0 doc got an email injected and counted
    assert(r.filter(col("doc_id") % 7 === 0 && col("n_emails") === 0).count() === 0)
    // redacted text carries the placeholders, never a residual match
    val residual = r.filter(
      col("redacted").rlike("[a-z0-9]+@[a-z0-9]+\\.[a-z]+") ||
        col("redacted").rlike("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")).count()
    assert(residual === 0)
    assert(r.filter(col("redacted").contains("<EMAIL>")).count() > 0)
    assert(r.filter(col("redacted").contains("<IP>")).count() > 0)
    r.unpersist()
  }

  test("char_entropy: positive, bounded by ln(distinct)") {
    val r = QualityFilters.charEntropy(spark, sf).cache()
    // H <= ln(k) for k symbols (uniform maximizes); allow 6dp slack
    val bad = r.filter(
      col("char_entropy") < 0 ||
        col("char_entropy") > log(col("n_distinct_chars").cast("double")) + 1e-6)
      .count()
    assert(bad === 0)
    r.unpersist()
  }

  test("sequence_pack: offsets in [0,512), pack ids contiguous from 0 per source") {
    val r = QualityFilters.sequencePack(spark, sf).cache()
    assert(r.filter(col("pack_offset") < 0 || col("pack_offset") >= 512).count() === 0)
    // first doc of each source starts at pack 0 offset 0
    val firsts = r.groupBy(col("source"))
      .agg(min_by(struct(col("pack_id"), col("pack_offset")), col("doc_id")).as("f"))
      .filter(col("f.pack_id") =!= 0 || col("f.pack_offset") =!= 0)
    assert(firsts.count() === 0)
    // total packed tokens per source == window end of the last doc
    val tot = r.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("s"),
        max(col("pack_id") * 512 + col("pack_offset")).as("lastStart"))
      .filter(col("s") < col("lastStart")).count()
    assert(tot === 0)
    r.unpersist()
  }

  test("mixture_sample: kept fraction tracks the per-source weight") {
    val kept = QualityFilters.mixtureSample(spark, sf)
      .groupBy(col("source"), col("weight_permille"))
      .agg(count(lit(1)).as("n"))
    val total = graft.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("tot"))
    // 25 docs/source at sf0.001 — just check direction: rate within
    // [w - 35, w + 35] permille is too tight for n=25; assert keep
    // rate is 0 < n <= tot and high-weight sources keep more than
    // low-weight on average (rank correlation > 0)
    val j = kept.join(total, Seq("source"))
      .select(col("weight_permille").cast("double").as("w"),
        (col("n").cast("double") / col("tot")).as("rate"))
    val c = j.agg(corr(col("w"), col("rate"))).head().getDouble(0)
    assert(c > 0.5, s"weight/rate correlation $c")
  }

  test("boilerplate_detect: counts bounded, synthetic boilerplate fully flagged") {
    import spark.implicits._
    val r = QualityFilters.boilerplateDetect(spark, sf).cache()
    assert(r.filter(col("n_boiler_grams") > col("n_grams")).count() === 0)
    assert(r.filter(col("boiler_ppm") < 0 || col("boiler_ppm") > 1000000).count() === 0)
    r.unpersist()
    // a source where every doc shares a template prefix: those grams
    // must be flagged in every doc, the unique tails must not
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    val docs = (1L to 10L).map(i =>
      (i, s"copyright acme corp all rights reserved unique$i tail$i body$i", "s1"))
    docs.toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val t = QualityFilters.boilerplateDetect(spark, dir).cache()
    // template = 6 shared tokens -> exactly 4 fully-shared 3-grams per
    // doc (grams crossing into the unique tail differ per doc)
    assert(t.filter(col("n_boiler_grams") =!= 4).count() === 0)
    assert(t.filter(col("n_boiler_grams") === col("n_grams")).count() === 0)
    t.unpersist()
  }

  test("curation_pipeline: survivors are a strict quality-gated subset, packed per source") {
    val r = QualityFilters.curationPipeline(spark, sf).cache()
    val total = graft.Tables.documents(spark, sf).count()
    val n = r.count()
    assert(n > 0 && n < total, s"survivors $n of $total")
    // benchmark docs never survive
    assert(r.filter(col("doc_id") % 97 === 0).count() === 0)
    // survivors of the repetition+entropy gate only
    val rep = QualityFilters.repetitionFilter(spark, sf)
      .select(col("doc_id"), col("passes_repetition")).cache()
    assert(r.join(rep, "doc_id").filter(col("passes_repetition") === 0).count() === 0)
    // packing invariants hold on the survivor set
    assert(r.filter(col("pack_offset") < 0 || col("pack_offset") >= 512).count() === 0)
    rep.unpersist(); r.unpersist()
  }

  test("semantic_dedup: keep_flag consistent; cluster count bounded by 16") {
    val r = QualityFilters.semanticDedup(spark, sf).cache()
    assert(r.filter(
      (col("keep_flag") === 1) =!= (col("n_similar_smaller") === 0)).count() === 0)
    assert(r.select(col("cluster_id")).distinct().count() <= 16)
    // every vector appears exactly once
    assert(r.count() === graft.Tables.embeddings(spark, sf).count())
    r.unpersist()
  }

  test("classifier_calibration: deciles partition the corpus, means sit in-bucket") {
    val rows = QualityFilters.classifierCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs)
    rows.foreach { case (bucket, n, keepPpm, meanMicro) =>
      assert(bucket >= 0 && bucket <= 9 && n > 0)
      assert(keepPpm >= 0 && keepPpm <= 1000000)
      // a decile's mean predicted prob lies inside the decile (bucket
      // 9 also holds prob = 1.0; ±1 covers the floor-div edge)
      assert(meanMicro >= bucket * 100000 - 1)
      assert(meanMicro <= (if (bucket == 9) 1000001L else (bucket + 1) * 100000 + 1))
    }
    // the per-doc keep flag aggregated independently must agree with
    // the census total
    val gateTotal = QualityFilters.repetitionFilter(spark, sf)
      .join(QualityFilters.charEntropy(spark, sf), "doc_id")
      .filter(col("top_word_ppm") <= 200000 &&
        col("dup_trigram_ppm") <= 300000 && col("char_entropy") >= 2.7)
      .count()
    val censusKept = rows.map { case (_, n, keepPpm, _) =>
      // keep_ppm = floor(kept * 1e6 / n) — invert exactly: kept is the
      // unique integer with floor(kept*1e6/n) = keepPpm
      (0L to n).find(k => k * 1000000L / n == keepPpm).get
    }.sum
    assert(censusKept == gateTotal)
  }
}
