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
    * stage — each line documents why.
    */
  private val allowed: Set[String] = Set(
    "q25_range_band_join", // O(1) broadcast band table, non-equi bounds
    "e01_cosine_pairs", // brute-force ground truth (vec_a < vec_b)
    "e02_ann_topk_bruteforce", // brute-force ground truth (!=)
    "e03_ann_ivf", // broadcast coarse-centroid assignment (cross, O(cents))
    "e06_ann_ivf_nprobe", // same centroid assignment, nprobe = 2
    "d06_embedding_neardup", // brute-force ground truth (dup_of < vec_id)
    "e04_ann_topk_partial", // brute-force pair scan (!=), reduced map-side
    "e07_ann_recall", // recall eval: exhaustive truth side (!=) + IVF assignment
    "e08_ann_recall_sweep", // nprobe sweep: same centroid cross + exhaustive truth + O(1) totals join
    "e09_ann_ivf_sq8", // IVF-SQ8: same broadcast centroid assignment cross
    "q63_kmv_sketch_union", // 1-row sketch x 1-row exact scalar join, O(1)
    "d11_boilerplate_strip", // 1-row broadcast boiler-fingerprint set
    "e10_semantic_dedup", // same broadcast centroid assignment cross
    "q69_histogram", // 1-row broadcast min/max bounds for bin edges
    "e11_knn_label_accuracy", // exhaustive top-3 ground truth (!=)
    "e12_semantic_dedup_against", // same broadcast centroid assignment cross
    "e13_ann_ivf_pq", // same broadcast centroid assignment cross
    "e14_pq_recall", // exhaustive ground truth (!=) + PQ index side
    "q76_key_skew_profile", // 1-row broadcast corpus scalars (total, n_keys)
    "e15_kmeans_refine", // broadcast centroid assignment cross, x3 iterations
    "e16_embedding_drift", // same broadcast centroid assignment cross
    "q83_point_in_time_state", // O(calendar) broadcast snapshot grid, non-equi
    "q84_market_basket", // 1-row broadcast basket-count scalar
    "q86_decile_gain", // 1-row broadcast customer-count scalar (ntile n)
    "e17_cell_silhouette", // same broadcast centroid assignment cross
    "m11_phash_recall", // exhaustive hamming ground truth (a < b)
    "e18_cell_balance", // same broadcast centroid assignment cross
    "q89_abc_pareto", // 1-row broadcast total-revenue scalar
    "q90_order_aging", // 1-row broadcast reference-date scalar
    "e19_pq_distortion", // same broadcast centroid assignment cross
    "q92_dow_seasonality", // 1-row broadcast totals scalar
    "e20_nn_distance_profile", // same broadcast centroid assignment cross
    "e21_lsh_recall", // exhaustive cosine ground truth (a < b)
    "e22_range_search", // same broadcast centroid assignment cross
    "t27_bigram_lift", // 1-row broadcast corpus-token-total scalar
    "q146_cmh_test", // 1-row broadcast global-median scalar (q69 pattern)
    "q149_raking_weights", // 1-row broadcast totals + max-error scalars
    "t28_term_burstiness", // 1-row broadcast doc-count scalar
    "d18_minhash_band_tuning", // 1-row broadcast truth-count scalar
    "d19_shingle_df_profile", // 1-row broadcast posting-total scalar
    "e23_mmr_rerank", // exact candidate ground truth (c_id != q_id)
    "d22_method_agreement", // 1-row broadcast truth-count scalar
    "e24_ivf_k_sweep", // 3 broadcast centroid crosses + exhaustive truth
    "e25_cell_medoid", // broadcast coarse-centroid assignment (cross, O(cents))
    "d27_source_minhash_jaccard", // |sources|^2 pairing of 17-column signature rows
    "e26_filtered_ann", // same broadcast centroid assignment cross
    "d28_simhash_radius_sweep", // exhaustive hamming ground truth (a < b)
    "e30_jl_projection_audit", // exhaustive truth in BOTH spaces (!=) — eval-twin contract
    "q112_price_volume_mix", // 1-row broadcast date-split scalar
    "q118_return_rate_outliers", // 1-row broadcast (nn, kk) totals scalar
    "e28_ood_screen", // same broadcast centroid assignment cross
    "d29_shingle_width_profile", // 1-row broadcast doc-count scalar
    "q127_cusum_drift", // 1-row broadcast (n, total) scalars
    "q164_poisson_bootstrap", // 1-row broadcast (n, mean_exact) scalars
    "t36_ks_drift", // dim x dim pooled-jump-point grid (q83's class) + 1-row total
    "q129_cms_frequency", // 1-row broadcast CMS counter matrix
    "q132_kmv_intersection", // 1-row sketch x 1-row exact scalar join, O(1)
    "q133_survival_km", // 1-row broadcast K-M factor list (|event times|)
    "q136_bitmap_distinct", // |priorities|^2 bitmap pairing (5x5, non-equi)
    "q175_nelson_aalen", // 1-row broadcast hazard-term list (q133 pattern)
    "q181_isotonic_calibration", // 6x21-bounded bin-interval lattice (q136 class)
    "q182_hosmer_lemeshow") // same bounded lattice + 1-row term-list broadcast
    // q121/e29's centroid-cross and date-split scalars — and q72's
    // corpus-max-day/count broadcasts — run inside their eager
    // Materialize stages, so their FINAL plans are product-free

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
      "replicate windows partition on b; exact-branch cum over value grid",
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
      "vocabulary frame (Heaps-law sublinear) — scale path: df-floor prefilter + m08 prefix sum")

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
