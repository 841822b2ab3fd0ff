package graft

/** Partition-count invariance — the determinism claim behind the
  * engine-exact arithmetic discipline, pinned directly: a
  * representative slice of the registry (exact-micros sums, iterative
  * graph labels, prefix-sum ordinals, hash-keyed sampling, sketch
  * readouts, window ranks) must produce IDENTICAL row sets when the
  * shuffle partition count changes. Operators whose results depended
  * on partition layout (float sum order, partition-id numbering,
  * RDD sampling) would diverge here long before a cluster resize
  * surfaced it in production.
  */
class DeterminismSpec extends SparkTestBase {

  private val probeQueries = Seq(
    "q1_agg",            // exact-micros aggregate sums
    "rollup_revenue",    // Expand + exact micros
    "group_quantiles",   // exact percentiles
    "global_ordinals",   // prefix-sum rank assignment
    "global_shuffle",    // hash-keyed shard positions
    "sample_stratified", // hash-bucket sampling
    "embedding_quantize",// integer quantization, narrow
    "decay_score",       // integer rational decay
    "heavy_hitters",     // sketch + exact recount
    "dedup_clusters",    // iterative connected components
    "anomaly_days",      // integer z-test over trailing windows
    "pack_efficiency",   // integer packing stats over a cumsum window
    "dedup_eval",        // sketch-vs-truth confusion counts
    "hll_distinct",      // MAX-merged registers + integer register sum
    "ngram_novelty",     // distinct-gram anti-membership counts
    "cmsketch_eval",     // SUM-merged CMS registers, min-over-rows lookups
    "bloom_eval",        // distinct-bucket bit table + all-k conjunction
    "hll_union",         // pairwise MAX-merged register algebra
    "market_share",      // DECIMAL(38) ppm share division
    "waiting_supplier_census", // clustered multi-stage blame census
    "embedding_pca_step",// integer-micros vector aggregation + norm
    "dedup_containment", // merge-walk set intersections, integer gate
    "cross_doc_spans",   // islands-on-diagonal window runs
    "span_coverage_incremental", // membership join + position-set union
    "dup_span_rewrite",  // anti-join survivors + ordered fingerprint
    "fuzzy_match_census",// blocked levenshtein census
    "source_divergence", // nanonat JSD integer lane + top-k caps
    "nb_domain_attribution", // NB argmin over exact long scores
    "cluster_representatives", // exact-integer argmin per label
    "join_size_estimate", // CM/AGMS register inner products
    "ab_chi2",           // DECIMAL(38) exact chi-square on hash arms
    "mannwhitney_value", // doubled-midrank integer U statistic
    "seasonal_adjust",   // epoch-day mod 7 profile, floor-micros means
    "dedup_channel_overlap", // union of three channels' pair sets
    "dist_drift",        // DECIMAL(38) chi-square census on count lanes
    "k_core",            // iterative peel fixpoint membership
    "importance_resample", // floor-div contrast lane + hash accept draw
    "corr_matrix",       // exact decimal moments, one final rounding
    "lang_id_eval",      // confusion census + floor-div share lanes
    "vocab_growth",      // first-occurrence min-agg + prefix sums
    "heldout_nll",       // nanonat model join + exact occurrence sums
    "min_cost_supplier", // grouped integer-cents min + tie-break rejoin
    "product_profit",    // multi-fact 1e4 integer lane rollup
    "excess_inventory",  // nested semi-join, strict integer threshold
    "adv_lang_id_eval",  // generated corpus + confusion census
    "adv_vocab_growth",  // generated corpus Heaps curve
    "adv_containment_ppjoin", // prefix-filter candidates + merge-walk verify
    "multimodal_bmp_decode",  // real-format parse, per-doc integer stats
    "multimodal_wav_decode",  // real-format parse, order-sensitive zc
    "fuzzy_match_blocked",    // composed simhash-band blocking census
    "label_propagation",      // synchronous majority rounds, min-label ties
    "skyline_frontier",       // bounded frontier + broadcast tie join-back
    "theil_sen_trend",        // two-middle-rank median over pair slopes
    "intradoc_dedup",         // narrow HOF rewrite, chunk-aligned
    "cusum_drift",            // prefix-sum min factorization, integer lane
    "zorder_layout",          // Morton interleave + integer range buckets
    "dedup_survivors",        // max-tokens-then-min-id two-agg election
    "hybrid_rrf",             // two bounded lane heaps + rank fusion
    "content_chunk_dedup",    // per-position boundary rule + spectrum
    "ols_trend",              // exact decimal moments over bounded months
    "dedup_keep_stats",       // survivor mapping applied, integer census
    "link_prediction",        // wedge join + integer RA ppm lane
    "lsh_band_eval",          // complete pair universe + integer matrix
    "degree_census"           // degree aggregates + bounded ccdf window
  )

  test("query results are invariant to the shuffle partition count") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def run(name: String): Set[String] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    try {
      val offenders = probeQueries.flatMap { name =>
        spark.conf.set(key, "32")
        val at32 = run(name)
        spark.conf.set(key, "7")
        val at7 = run(name)
        if (at32 == at7 && at32.nonEmpty) None
        else Some(s"$name (32p: ${at32.size} rows, 7p: ${at7.size} rows)")
      }
      assert(offenders.isEmpty,
        s"partition-count-dependent results: $offenders")
    } finally spark.conf.set(key, prev)
  }
}
