package graft

/** Plan lint over the ENTIRE query inventory: no operator may plan a
  * CartesianProduct or BroadcastNestedLoopJoin unless it is one of the
  * intentional brute-force pair generators (ground-truth similarity
  * scans whose non-equi conditions have no equi form, or an O(1)
  * broadcast band table). Any new operator that accidentally degrades
  * to a product join fails here before it ever reaches a cluster.
  */
class PlanLintSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately contain a nested-loop/cartesian
    * stage. Every entry MUST cite its bound through one of four
    * structured classes (vocabulary enforced by a test below — the
    * round-8 lesson: e30 hid an unbounded full-corpus cartesian behind
    * a free-text "eval-twin" comment for a whole round):
    *
    *  - "O(1) broadcast: ..."  — one side is a ≤k-row scalar/sketch/
    *    factor-list aggregate (k fixed, independent of data volume)
    *  - "bounded cross: ..."   — both loop dimensions are bounded by
    *    dimension/grid cardinality (centroids, bands, calendar,
    *    priority², bin lattice), never by fact rows
    *  - "sampled: ..."         — one side is a deterministic
    *    hash-sample of the corpus (cite the rate), the other a linear
    *    scan: O(n·rate·n) with rate chosen so the pair count stays
    *    ~linear at the gate SFs
    *  - "eval-twin: ..."       — a declared O(n²) ground-truth scan
    *    whose OUTPUT is the recall/distortion measurement itself; the
    *    entry must name the production-scale path it audits
    */
  // Round 12: the shared IVF centroid-assignment cross now executes
  // inside an eager Materialize.LocalCheckpoint cut in e03/e06/e10/e12/
  // e13/e15/e16/e17/e19/e20/e22, so their final plans no longer contain
  // a product join for this lint to see (the bounded cross still runs,
  // once, at the cut).
  private val productAllowed: Map[String, String] = Map(
    "q25_range_band_join" -> "O(1) broadcast: band table, non-equi bounds",
    "e01_cosine_pairs" -> "eval-twin: brute-force cosine truth (a < b); audits e05's LSH recall",
    "e02_ann_topk_bruteforce" -> "eval-twin: exact top-k truth (!=); the baseline e03/e06 are measured against",
    "d06_embedding_neardup" -> "eval-twin: brute-force near-dup truth (dup_of < vec_id); audits d04/e10",
    "e04_ann_topk_partial" -> "eval-twin: pair-scan truth (!=) with map-side reduction; e02's cheaper variant",
    "e07_ann_recall" -> "eval-twin: exhaustive truth side (!=) scoring e03's IVF recall",
    "e08_ann_recall_sweep" -> "eval-twin: exhaustive truth + bounded centroid cross + O(1) totals join",
    "q63_kmv_sketch_union" -> "O(1) broadcast: 1-row sketch x 1-row exact scalar",
    "d11_boilerplate_strip" -> "O(1) broadcast: boiler-fingerprint set",
    "q69_histogram" -> "O(1) broadcast: min/max bounds for bin edges",
    "e11_knn_label_accuracy" -> "eval-twin: exhaustive top-3 truth (!=) scoring label agreement",
    "e14_pq_recall" -> "eval-twin: exhaustive truth (!=) scoring e13's PQ recall",
    "q76_key_skew_profile" -> "O(1) broadcast: corpus scalars (total, n_keys)",
    "q83_point_in_time_state" -> "bounded cross: O(calendar) broadcast snapshot grid",
    "q84_market_basket" -> "O(1) broadcast: basket-count scalar",
    "q86_decile_gain" -> "O(1) broadcast: customer-count scalar (ntile n)",
    "m11_phash_recall" -> "eval-twin: exhaustive hamming truth (a < b) scoring m07's LSH recall",
    // m07's banding-width scalar no longer rides in-plan (round 13:
    // the width is chosen at plan build from the materialized
    // fingerprint count), so its plan is product-free now
    "m19_band_tuning" -> "eval-twin: exhaustive hamming truth (a < b) + 1-row cost/found scalars for the banding sweep m07's adaptive widths are chosen from",
    "e18_cell_balance" -> "bounded cross: broadcast centroid assignment",
    "q89_abc_pareto" -> "O(1) broadcast: total-revenue scalar",
    "q90_order_aging" -> "O(1) broadcast: reference-date scalar",
    "q92_dow_seasonality" -> "O(1) broadcast: totals scalar",
    "e21_lsh_recall" -> "eval-twin: exhaustive cosine truth (a < b) scoring e05's recall",
    "t27_bigram_lift" -> "O(1) broadcast: corpus-token-total scalar",
    "q146_cmh_test" -> "O(1) broadcast: global-median scalar (q69 pattern)",
    "q149_raking_weights" -> "O(1) broadcast: totals + max-error scalars",
    "t28_term_burstiness" -> "O(1) broadcast: doc-count scalar",
    "d18_minhash_band_tuning" -> "O(1) broadcast: truth-count scalar",
    "d19_shingle_df_profile" -> "O(1) broadcast: posting-total scalar",
    "e23_mmr_rerank" -> "eval-twin: exact candidate truth (c_id != q_id) the MMR picks re-rank",
    "d22_method_agreement" -> "O(1) broadcast: truth-count scalar",
    "e24_ivf_k_sweep" -> "eval-twin: 3 bounded centroid crosses + exhaustive truth for the sweep",
    "e25_cell_medoid" -> "bounded cross: broadcast coarse-centroid assignment (O(cents))",
    "d27_source_minhash_jaccard" -> "bounded cross: |sources|^2 pairing of 17-column signature rows",
    "e26_filtered_ann" -> "bounded cross: broadcast centroid assignment",
    "d28_simhash_radius_sweep" -> "eval-twin: exhaustive hamming truth (a < b) for the radius sweep",
    "e30_jl_projection_audit" -> "sampled: min(1/16, 64/n) md5 hash-sample (2^24 buckets, rate floor 1/2^24) query side x corpus — the ~64-query cap binds from sf0.1 up, so the truth scan is capped-linear at every gate SF (was the round-8 full n² scale-killer; round-9 item 6 moved the knee below the gate SFs)",
    "q112_price_volume_mix" -> "O(1) broadcast: date-split scalar",
    "q118_return_rate_outliers" -> "O(1) broadcast: (nn, kk) totals scalar",
    "e28_ood_screen" -> "bounded cross: broadcast centroid assignment",
    "d29_shingle_width_profile" -> "O(1) broadcast: doc-count scalar",
    "q127_cusum_drift" -> "O(1) broadcast: (n, total) scalars",
    "q202_page_hinkley" -> "O(1) broadcast: (sk, k) calibration scalars",
    "e32_residual_quantization" -> "bounded cross: broadcast coarse-centroid assignment + capped-256 residual-codebook assignment",
    "q164_poisson_bootstrap" -> "O(1) broadcast: (n, mean_exact) scalars",
    "q170_bootstrap_median_ci" -> "O(1) broadcast: (n + 32 replicate-total) scalars (q164 pattern; round-13 two-phase grid cumsum)",
    "t36_ks_drift" -> "bounded cross: dim x dim pooled-jump-point grid (q83's class) + 1-row total",
    "q129_cms_frequency" -> "O(1) broadcast: CMS counter matrix",
    "q132_kmv_intersection" -> "O(1) broadcast: 1-row sketch x 1-row exact scalar",
    "q201_engle_granger" -> "O(1) broadcast: two 1-row moment frames crossed",
    "q133_survival_km" -> "O(1) broadcast: K-M factor list (|event times|)",
    "q136_bitmap_distinct" -> "bounded cross: |priorities|^2 bitmap pairing (5x5, non-equi)",
    "q175_nelson_aalen" -> "O(1) broadcast: hazard-term list (q133 pattern)",
    "q181_isotonic_calibration" -> "bounded cross: 6x21 bin-interval lattice (q136 class)",
    "q182_hosmer_lemeshow" -> "bounded cross: bounded lattice + 1-row term-list broadcast")
    // q121/e29's centroid-cross and date-split scalars — and q72's
    // corpus-max-day/count broadcasts — run inside their eager
    // Materialize stages, so their FINAL plans are product-free

  private val allowed: Set[String] = productAllowed.keySet

  /** Queries whose plans legitimately contain an UNPARTITIONED Window
    * (single-partition sort + window over the whole frame) — each entry
    * documents why the frame is bounded: a value GRID (cardinality =
    * distinct values, not rows) or a ≤N-row aggregate. An unpartitioned
    * window over a per-row frame would serialize the whole dataset
    * through one task at 100 TB; this lint stops that from slipping in.
    */
  private val windowAllowed: Map[String, String] = Map(
    // --- value GRIDS: frame cardinality = distinct quantized values
    // (cents / |diff| / score / duration / length), not row count ---
    "q134_mannwhitney_u" -> "cents-quantized value grid",
    "q139_kruskal_wallis" -> "cents-quantized value grid",
    "q146_cmh_test" -> "cents value grid + strata cells",
    "q147_jonckheere_trend" -> "cents value grid",
    "q163_dunn_posthoc" -> "cents value grid",
    "q164_poisson_bootstrap" ->
      "replicate windows partition on b; exact-branch cum over value grid",
    "q170_bootstrap_median_ci" ->
      "range-partition offset table only (<=numShufflePartitions rows; round-13 two-phase grid cumsum)",
    "q171_roc_auc" -> "distinct score grid",
    "q178_wilcoxon_signed_rank" -> "|diff| value grid",
    "q184_brunner_munzel" -> "pooled midrank value grid",
    "q185_cramer_von_mises" -> "pooled value grid",
    "q133_survival_km" -> "distinct event-time grid",
    "q174_logrank" -> "distinct event-time grid",
    "q175_nelson_aalen" -> "distinct event-time grid",
    "t36_ks_drift" -> "n_chars value grid",
    "t38_good_turing" -> "frequency-of-frequencies grid",
    // --- calendar-bounded series: frame = days/weeks observed ---
    "q115_order_backlog_curve" -> "calendar day grid",
    "q127_cusum_drift" -> "calendar day grid",
    "q202_page_hinkley" -> "calendar day grid",
    "q191_seasonal_strength" -> "calendar day grid (centered 7-day MA)",
    "q156_acf_ljung_box" -> "weekly series + lag grid",
    "q157_benford_screen" -> "weekly series + distinct-y grid",
    "q159_pettitt_changepoint" -> "weekly series + distinct-y grid",
    "q160_runs_test" -> "weekly series",
    "q176_forecast_backtest" -> "weekly series + |diff| grid",
    "q177_diebold_mariano" -> "weekly series + |diff| grid",
    "q188_walkforward_ols" -> "weekly series",
    "q192_chow_test" -> "weekly series (midpoint min/max window)",
    "q193_durbin_watson" -> "weekly series (lag window)",
    "q200_granger_causality" -> "weekly series (lag window)",
    "q201_engle_granger" -> "weekly series (lag window)",
    "q195_influence" -> "weekly series (moment window sums)",
    "q198_supf_break" -> "weekly series (cumulative + total moment windows)",
    "q199_hac_se" -> "weekly series (moment windows + score lags)",
    "q75_growth_accounting" -> "per-day daily-accounting frame",
    // --- sketches / fixed cells / post-limit frames ---
    "q63_kmv_sketch_union" -> "<=|event_types|*k sketch rows (k=64)",
    "q132_kmv_intersection" -> "KMV sketch rows (k=128)",
    "q103_chisq_association" -> "priority x status contingency cells",
    "q143_simpson_reversal" -> "strata x group cells",
    "q112_price_volume_mix" -> "5 market-segment rows",
    "q94_order_size_histogram" -> "order-size bin grid",
    "q95_activity_heatmap" -> "24x7 heatmap cells",
    "q99_benford_profile" -> "9 digit rows",
    "q167_bh_fdr" -> "m = |nations| hypotheses",
    "q142_wilson_ranking" -> "|brands| (25) rows",
    "q76_key_skew_profile" -> "10 rows post-TakeOrdered-limit",
    "q82_top_paths" -> "10 rows post-TakeOrdered-limit",
    "t14_mixture_weights" -> "per-source rows",
    "t29_coverage_curve" -> "16 shard rows",
    "t33_mixture_resample" -> "per-source rows",
    "t35_dedup_mixture_shift" -> "per-source rows",
    "d24_pipeline_funnel" -> "5 funnel-stage rows",
    "t43_stratified_split" ->
      "per-source offset table (|sources| rows) + range-partition offset table (Packing.orderedRank)",
    // --- dimension/corpus-derived frames where the exact global rank
    // IS the declared contract; each names its 100 TB escape hatch ---
    "q16_window_rank_family" ->
      "supplier dim frame; rank-family demo — scale path: range-partitioned two-phase rank (Packing.orderedRank)",
    "q72_rfm_segmentation" ->
      "range-partition offset tables only (<=numShufflePartitions rows; Packing.orderedRank x3)",
    "q86_decile_gain" ->
      "range-partition offset table only (<=numShufflePartitions rows; Packing.orderedPrefixSum)",
    "q89_abc_pareto" ->
      "range-partition offset table only (<=numShufflePartitions rows; Packing.orderedPrefixSum)",
    "q113_supplier_skyline" ->
      "sorted 2-D skyline sweep over the supplier dim frame (declared O(n log n) contract)",
    "t13_vocab_coverage" ->
      "vocabulary frame (Heaps-law sublinear) — scale path: df-floor prefilter + m08 prefix sum",
    "t48_vocab_sweep" ->
      "vocabulary frame (Heaps-law sublinear) — t13's class; df-floor prefilter at scale (every V of interest sits far above the floor)")

  test("unpartitioned Window operators only over documented bounded " +
      "frames (grid or <=N-row aggregate)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val unpart = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (unpart.nonEmpty && !windowAllowed.contains(name)) Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows outside the allowlist: $offenders")
  }

  test("unpartitioned-window allowlist is not stale") {
    import org.apache.spark.sql.execution.window.WindowExec
    val stale = windowAllowed.keySet.filter { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
      plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.isEmpty
    }
    assert(stale.isEmpty, s"allowlist entries without unpartitioned windows: $stale")
  }

  test("no unintended CartesianProduct/BroadcastNestedLoopJoin anywhere " +
      "in the operator inventory") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad && !allowed.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"product joins outside the allowlist: $offenders")
  }

  test("every product-join allowlist entry cites a structured bound " +
      "class (no free-text waves-through)") {
    val classes = Seq("O(1) broadcast: ", "bounded cross: ", "sampled: ",
      "eval-twin: ")
    val unbounded = productAllowed.filterNot { case (_, reason) =>
      classes.exists(reason.startsWith)
    }
    assert(unbounded.isEmpty,
      s"product-join entries without a bound class: ${unbounded.keys}")
    // a sampled entry must name its rate; an eval-twin must name what
    // it audits (the production-scale path it is the truth side for).
    // The keyword check runs on the text AFTER the class prefix —
    // checking the full string would be vacuous ("eval-twin: "
    // contains "twin" by construction).
    productAllowed.foreach {
      case (name, r) if r.startsWith("sampled: ") =>
        assert(r.stripPrefix("sampled: ").contains("/"),
          s"$name: sampled entry must cite its rate")
      case (name, r) if r.startsWith("eval-twin: ") =>
        val body = r.stripPrefix("eval-twin: ")
        assert(body.contains("audit") || body.contains("scoring") ||
          body.contains("measured against") || body.contains("re-rank") ||
          body.contains("sweep") || body.contains("truth"),
          s"$name: eval-twin entry must name what it audits")
      case _ =>
    }
  }

  test("every allowlisted brute-force query really needs its product " +
      "join (allowlist is not stale)") {
    val stale = allowed.filter { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      !plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"allowlist entries without product joins: $stale")
  }
}
