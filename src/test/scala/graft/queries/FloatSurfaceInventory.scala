package graft.queries

/** The gated-surface float inventory consumed by FloatSurfaceSpec: one
  * entry per (query, Double/Float output column). Tag is one of
  *   "ieee"   — exact integer/DECIMAL inputs through a SHORT, SHARED-
  *              ORDER chain of correctly-rounded IEEE ops (int→double
  *              casts of values < 2^53, decimal→double casts whose
  *              scale divisor 10^s (s ≤ 22) is exactly representable,
  *              at most a few divisions/multiplications in a fixed
  *              order, sqrt — which IEEE 754 requires to be correctly
  *              rounded). Both engines produce the identical bit
  *              pattern; no libm call anywhere.
  *   "libm"   — the pipeline calls a transcendental (ln/exp/pow) whose
  *              last-ulp is library-specific. Gated only because the
  *              inputs are exact and shared-order and the DISPLAY is
  *              round(·, 6) (or a micro-integer rendering) whose tie
  *              margins RoundTieSpec measures in situ at sf0.01 — a
  *              1-ulp wobble cannot cross a round-6 boundary away from
  *              a measured tie. These are the columns to band or
  *              decimalize FIRST if the driver env ever flips them
  *              (the q71→q84/q89 escalation path).
  *   "banded" — the double is advisory; the gated decision rides the
  *              named companion band/flag column (exact arithmetic).
  * The value's second element records the chain / why / band column.
  *
  * Shared chains are named below so the inventory reads as data; a
  * column with an unusual pipeline carries its own string.
  */
object FloatSurfaceInventory {

  /** Column read from parquet (or a literal constant) and emitted
    * unchanged — both engines hash the stored bits. */
  private val pass = ("ieee",
    "parquet/literal passthrough — no arithmetic")

  /** Exact DECIMAL sum (partial+final, exact at any order) → ONE
    * correctly-rounded cast to double. */
  private val decCast = ("ieee",
    "exact DECIMAL sum -> one correctly-rounded double cast")

  /** Exact BIGINT/DECIMAL operands → int→double casts (< 2^53) →
    * ONE IEEE division (optionally round-6 display, margins measured
    * by RoundTieSpec). */
  private val ratio = ("ieee",
    "exact int/decimal operands -> one IEEE division (round-6 display)")

  /** Exact integer moment sums (n·Σxy − Σx·Σy shapes) → a fixed-order
    * handful of double products/divisions (and IEEE-exact sqrt where
    * noted) → round-6 display. */
  private val moments = ("ieee",
    "exact integer moments -> fixed-order double ratio algebra" +
      " (sqrt is IEEE-exact) -> round-6 display")

  /** Fixed-dimension array fold in index order (zip_with/aggregate
    * over the embedding), identical term order in the mirrored oracle,
    * + IEEE-exact sqrt for norms. */
  private val cosFold = ("ieee",
    "fixed-dim index-ordered dot/norm fold (shared order in oracle)" +
      " + IEEE-exact sqrt + one division")

  /** ln/exp/pow-bearing; exact shared-order inputs; round-6 (or
    * micro-int) display with RoundTieSpec-measured tie margins. */
  private val libm = ("libm",
    "transcendental on exact shared-order inputs; round-6/micro-int" +
      " display, tie margins measured by RoundTieSpec at sf0.01")

  val inventory: Map[(String, String), (String, String)] = Map(
    // --- dedup family: exact set-size ratios -----------------------
    ("d02_minhash_lsh", "jaccard") -> ratio,
    ("d04_ngram_jaccard", "jaccard") -> ratio,
    ("d05_embedding_neardup", "cos") -> cosFold,
    ("d10_repeated_spans", "dup_ratio") -> ratio,
    ("d13_soft_dedup", "weight") -> ratio,
    ("d13_soft_dedup", "eff_tokens") -> ratio,
    ("d14_containment", "containment") -> ratio,
    ("d16_nearest_dup", "jaccard") -> ratio,
    ("d18_band_tuning", "recall") -> ratio,
    ("d19_threshold_sweep", "tau") -> pass,
    ("d19_threshold_sweep", "drop_frac") -> ratio,
    ("d21_cdc_chunks", "stored_frac") -> ratio,
    ("d23_incremental_chunks", "new_frac") -> ratio,
    ("d24_winnowing", "fp_jaccard") -> ratio,
    // --- message family: payload passthrough -----------------------
    ("m02_content_type_dispatch", "value") -> pass,
    ("m09_schema_inference", "value") -> pass,
    ("ps01_stream_ingest", "value") -> pass,
    // --- multimodal -------------------------------------------------
    ("mm08_caption_align", "align") -> cosFold,
    ("mm09_header_parse", "aspect") -> ratio,
    ("mm10_aspect_bucket", "waste_ratio") -> ratio,
    ("mm13_phash_dct", "avg_hamming") -> ratio,
    // --- pipeline shaping -------------------------------------------
    ("p10_domain_cap", "quality") -> ("ieee",
      "exact e6 integer quality -> double cast -> /1e6 (both exact)"),
    ("p12_quality_canonical", "canonical_quality") -> ("ieee",
      "t02's exact e6 integer quality carried through unchanged"),
    ("p13_contamination_fraction", "contamination") -> ratio,
    ("p18_weighted_sample", "sample_key") -> libm,
    ("p19_stratified_weighted", "sample_key") -> libm,
    ("p21_dataset_card", "pct_en") -> ratio,
    ("p21_dataset_card", "mean_chars") -> ratio,
    ("p21_dataset_card", "lang_entropy") -> libm,
    ("p22_budget_fill", "quality") -> ratio,
    ("p24_unimax_mix", "fill_ratio") -> ratio,
    ("p25_padding_waste", "waste_ratio") -> ratio,
    ("p27_repeat_schedule", "epochs") -> ratio,
    ("p28_seqlen_sweep", "pad_waste") -> ratio,
    ("p28_seqlen_sweep", "trunc_loss") -> ratio,
    ("p29_quality_frontier", "tau") -> pass,
    ("p29_quality_frontier", "token_frac") -> ratio,
    ("p29_quality_frontier", "mean_quality") -> ratio,
    ("p30_filter_agreement", "agreement") -> moments,
    ("p30_filter_agreement", "kappa") -> moments,
    ("p31_dsir_importance", "log_weight") -> libm,
    ("p33_rendezvous_reshard", "moved_frac") -> ratio,
    ("p34_k_anonymity", "pct_at_risk") -> ratio,
    ("p35_incremental_stats", "mean_chars") -> ratio,
    ("p35_incremental_stats", "var_chars") -> moments,
    ("p36_l_diversity", "pct_rows") -> ratio,
    ("p37_token_gini", "gini") -> ratio,
    ("p37_token_gini", "top_decile_share") -> ratio,
    ("p39_t_closeness", "emd") -> ("ieee",
      "exact BIGINT L1 of cumulative-rank diffs -> one IEEE division"),
    // --- relational/TPC-H-ish ---------------------------------------
    ("q01_pricing_summary", "sum_qty") -> decCast,
    ("q01_pricing_summary", "sum_base_price") -> decCast,
    ("q01_pricing_summary", "sum_disc_price") -> decCast,
    ("q01_pricing_summary", "sum_charge") -> ("ieee",
      "exact DECIMAL sum -> round(·,4) in decimal -> one double cast"),
    ("q01_pricing_summary", "avg_qty") -> ratio,
    ("q01_pricing_summary", "avg_price") -> ratio,
    ("q02_forecast_revenue", "revenue") -> decCast,
    ("q03_shipping_priority", "revenue") -> decCast,
    ("q05_local_supplier_volume", "revenue") -> decCast,
    ("q07_top_orders_per_customer", "o_totalprice") -> pass,
    ("q08_running_order_value", "running_value") -> ("ieee",
      "exact DECIMAL window prefix sum -> one double cast"),
    ("q09_top100_lineitems", "l_extendedprice") -> pass,
    ("q11_rollup_returns", "sum_qty") -> decCast,
    ("q12_cube_segments", "sum_acctbal") -> decCast,
    ("q15_date_functions", "total_value") -> decCast,
    ("q16_big_customers", "customer_value") -> decCast,
    ("q17_pivot_event_values", "purchase_value") -> decCast,
    ("q21_grouping_sets", "sum_qty") -> decCast,
    ("q22_weighted_avg_udaf", "wavg_price") -> ("ieee",
      "typed Aggregator: exact DECIMAL sums -> one final IEEE division"),
    ("q25_salted_aggregation", "sum_value") -> decCast,
    ("q26_group_topk", "price") -> pass,
    ("q27_percentiles", "p25") -> ("ieee",
      "exact values + linear interpolation (few IEEE ops, shared" +
        " order) -> round-6 display"),
    ("q27_percentiles", "p50") -> ("ieee",
      "exact values + linear interpolation -> round-6 display"),
    ("q27_percentiles", "p75") -> ("ieee",
      "exact values + linear interpolation -> round-6 display"),
    ("q27_percentiles", "p90") -> ("ieee",
      "exact values + linear interpolation -> round-6 display"),
    ("q29_unpivot", "value") -> decCast,
    ("q30_lateral_topk", "c_acctbal") -> pass,
    ("q35_cohort_retention", "retention") -> ratio,
    ("q36_price_histogram", "lo") -> ("ieee",
      "small int x exact literal 5000.0 — product exact in double"),
    ("q36_price_histogram", "hi") -> ("ieee",
      "small int x exact literal 5000.0 — product exact in double"),
    ("q36_price_histogram", "sum_price") -> decCast,
    ("q38_spend_quartiles", "total_spend") -> decCast,
    ("q40_gapfill", "value_ffill") -> pass,
    ("q41_rolling_anomaly", "v") -> decCast,
    ("q41_rolling_anomaly", "mean24") -> moments,
    ("q41_rolling_anomaly", "z") -> moments,
    ("q42_weekly_trend", "slope") -> moments,
    ("q43_equidepth_histogram", "lo") -> pass,
    ("q43_equidepth_histogram", "hi") -> pass,
    ("q43_equidepth_histogram", "sum_price") -> decCast,
    ("q44_transition_matrix", "p") -> ratio,
    ("q46_basket_lift", "lift") -> ratio,
    ("q49_skyline", "price") -> pass,
    ("q50_salted_join", "revenue") -> decCast,
    ("q51_subquery_decorrelation", "total_bal") -> decCast,
    ("q52_regression_agg", "slope_k_per_qty") -> moments,
    ("q52_regression_agg", "intercept_k") -> moments,
    ("q52_regression_agg", "r2") -> moments,
    ("q53_runtime_filter_join", "revenue") -> decCast,
    ("q55_time_weighted_avg", "span_s") -> ("ieee",
      "exact DECIMAL span sum -> round(·,4) -> one double cast"),
    ("q55_time_weighted_avg", "twa") -> ("ieee",
      "exact DECIMAL(38,12) products summed -> round4 -> one division"),
    ("q56_rank_functions", "total") -> pass,
    ("q56_rank_functions", "prnk") -> ("ieee",
      "percent_rank = (rank-1)/(n-1): exact ints, one IEEE division," +
        " round-6 display"),
    ("q56_rank_functions", "cdist") -> ("ieee",
      "cume_dist = cum_n/n: exact ints, one IEEE division, round-6"),
    ("q56_rank_functions", "top_total") -> pass,
    ("q57_exact_quantiles", "q") -> pass,
    ("q57_exact_quantiles", "value") -> pass,
    // --- analytics / model-eval --------------------------------------
    ("q61_shapley_attribution", "shapley") -> ratio,
    ("q62_survival_km", "km_log_survival") -> libm,
    ("q63_absorbing_markov", "p_absorb") -> ("ieee",
      "exact micro-unit BIGINT probability -> /1e9 (one division)"),
    ("q64_path_mining", "share") -> ratio,
    ("q65_poisson_bootstrap", "mean_price") -> ratio,
    ("q65_poisson_bootstrap", "ci_lo") -> ("ieee",
      "element_at of sorted per-replicate means, each an exact-sum" +
        " ratio (one division per replicate)"),
    ("q65_poisson_bootstrap", "ci_hi") -> ("ieee",
      "element_at of sorted per-replicate means, each an exact-sum" +
        " ratio"),
    ("q66_multiple_regression", "b0") -> moments,
    ("q66_multiple_regression", "b1") -> moments,
    ("q66_multiple_regression", "b2") -> moments,
    ("q66_multiple_regression", "r2") -> moments,
    ("q67_decile_lift", "conv_rate") -> ratio,
    ("q67_decile_lift", "lift") -> ratio,
    ("q67_decile_lift", "cum_gain") -> ratio,
    ("q68_calibration", "mean_p") -> ratio,
    ("q68_calibration", "obs_rate") -> ratio,
    ("q68_calibration", "gap") -> ("ieee",
      "abs difference of two exact-int ratios (shared order)"),
    ("q69_auc_roc", "auc") -> ratio,
    ("q69_auc_roc", "gini") -> ("ieee",
      "2·auc − 1 off the exact-ratio auc (two IEEE ops)"),
    ("q70_ks_separation", "ks") -> ratio,
    ("q73_cusum_changepoint", "cusum_max") -> ratio,
    ("q73_cusum_changepoint", "mean_before") -> ratio,
    ("q73_cusum_changepoint", "mean_after") -> ratio,
    ("q74_seasonal_decompose", "revenue") -> ratio,
    ("q74_seasonal_decompose", "trend") -> ratio,
    ("q74_seasonal_decompose", "seasonal") -> ratio,
    ("q74_seasonal_decompose", "residual") -> ("ieee",
      "difference of two exact-int ratios (shared order)"),
    ("q75_funnel_latency", "mean_s") -> ratio,
    ("q76_pr_curve", "precision") -> ratio,
    ("q76_pr_curve", "recall") -> ratio,
    ("q76_pr_curve", "f1") -> ratio,
    ("q77_conformal_coverage", "coverage") -> ratio,
    ("q77_conformal_coverage", "avg_set_size") -> ratio,
    ("q78_ab_significance", "p_a") -> ratio,
    ("q78_ab_significance", "p_b") -> ratio,
    ("q78_ab_significance", "risk_diff") -> ("ieee",
      "difference of two exact-int ratios (shared order)"),
    ("q78_ab_significance", "z") -> moments,
    ("q79_did", "p_a0") -> ratio,
    ("q79_did", "p_a1") -> ratio,
    ("q79_did", "p_b0") -> ratio,
    ("q79_did", "p_b1") -> ratio,
    ("q79_did", "did") -> ("ieee",
      "difference-of-differences of four exact-int ratios (shared" +
        " order)"),
    ("q80_mann_kendall", "z") -> moments,
    ("q81_benford_audit", "obs_share") -> ratio,
    ("q81_benford_audit", "benford_p") -> libm,
    ("q81_benford_audit", "abs_dev") -> libm,
    ("q81_benford_audit", "tvd") -> libm,
    ("q82_cohort_ltv", "cum_revenue") -> ratio,
    ("q82_cohort_ltv", "ltv") -> ratio,
    ("q85_quality_length_spearman", "rho") -> moments,
    ("q87_isotonic_calibration", "obs_rate") -> ratio,
    ("q87_isotonic_calibration", "fitted") -> ("ieee",
      "PAV min/max over exact-int ratios — selection, not" +
        " accumulation"),
    ("q88_adamic_adar", "aa_score") -> libm,
    ("q90_anova_length_by_source", "mean_g") -> ratio,
    ("q90_anova_length_by_source", "ssb") -> ("ieee",
      "round-6 DECIMAL sum -> double cast minus exact-int square" +
        " ratio (fixed order; squared after the cast, q90 width note)"),
    ("q90_anova_length_by_source", "ssw") -> ("ieee",
      "round-6 DECIMAL sum -> one double cast"),
    ("q90_anova_length_by_source", "f_stat") -> ("ieee",
      "fixed-order ratio of the two audited sums, NULL-guarded" +
        " degenerates"),
    ("q91_markov_removal", "removal_effect") -> ("ieee",
      "exact micro-unit BIGINTs -> one IEEE division, NULL-guarded"),
    ("q94_mann_whitney", "z") -> moments,
    ("q98_kruskal_wallis", "h_stat") -> ("ieee",
      "exact e6 fixed-point rank-square sum -> fixed-order double" +
        " ratio algebra (no libm), NULL-guarded degenerates"),
    // --- similarity / ANN --------------------------------------------
    ("s01_ann_bruteforce", "cos") -> cosFold,
    ("s02_ann_lsh", "cos") -> cosFold,
    ("s03_ann_ml_lsh", "dist") -> ("ieee",
      "Spark ML euclidean: fixed-dim index-ordered fold + IEEE-exact" +
        " sqrt; oracle mirrors the same fold order; round-6 display"),
    ("s04_ann_ivf", "cos") -> cosFold,
    ("s05_ann_recall", "recall") -> ratio,
    ("s06_ann_sq8", "cos") -> cosFold,
    ("s07_ann_pq", "cos") -> cosFold,
    ("s08_ann_ivfpq", "cos") -> cosFold,
    ("s09_ann_filtered", "cos") -> cosFold,
    ("s11_ann_multiprobe", "cos") -> cosFold,
    ("s13_mmr_rerank", "score") -> ("ieee",
      "cosine fold + fixed-order 0.7·sim − 0.3·mdiv combination"),
    ("s14_ivf_balance", "balance") -> ratio,
    ("s14_ivf_balance", "mean_cos") -> ratio,
    ("s15_pq_distortion", "mse") -> ratio,
    ("s16_ann_binary", "cos") -> cosFold,
    ("s17_ann_probe_sweep", "avg_candidates") -> ratio,
    ("s17_ann_probe_sweep", "mean_recall") -> ratio,
    ("s18_cluster_purity", "cell_purity") -> ratio,
    ("s18_cluster_purity", "global_purity") -> ratio,
    ("s18_cluster_purity", "nmi") -> libm,
    ("s19_matryoshka_recall", "mean_recall") -> ratio,
    ("s20_compression_frontier", "mean_recall") -> ratio,
    ("s21_ann_tombstones", "ann_cos") -> cosFold,
    ("s23_bm25", "score") -> libm,
    // --- text analysis -----------------------------------------------
    ("t02_quality_score", "stopword_ratio") -> ("ieee",
      "exact e6 half-up integer rounding -> double cast -> /1e6"),
    ("t02_quality_score", "unique_ratio") -> ("ieee",
      "exact e6 half-up integer rounding -> double cast -> /1e6"),
    ("t02_quality_score", "mean_token_len") -> ("ieee",
      "exact e6 half-up integer rounding -> double cast -> /1e6"),
    ("t02_quality_score", "quality") -> ("ieee",
      "exact e6 half-up integer rounding -> double cast -> /1e6"),
    ("t06_repetition_ratio", "dup_word_ratio") -> ratio,
    ("t06_repetition_ratio", "dup_bigram_ratio") -> ratio,
    ("t07_tfidf_keywords", "tfidf") -> libm,
    ("t09_bigram_ppl", "avg_logprob") -> libm,
    ("t09_bigram_ppl", "ppl") -> libm,
    ("t10_gopher_rules", "mean_word_len") -> ratio,
    ("t12_readability", "fk_grade") -> ("ieee",
      "exact e4 integer grade -> double cast -> /1e4"),
    ("t13_mojibake", "bad_ratio") -> ratio,
    ("t14_ngram_novelty", "novelty") -> ratio,
    ("t15_char_entropy", "entropy") -> libm,
    ("t16_sentence_stats", "mean_chars") -> ratio,
    ("t17_vocab_coverage", "oov_rate") -> ratio,
    ("t18_zipf_slope", "slope") -> libm,
    ("t18_zipf_slope", "intercept") -> libm,
    ("t18_zipf_slope", "r2") -> libm,
    ("t19_code_detect", "sym_ratio") -> ratio,
    ("t20_langid_confusion", "share") -> ratio,
    ("t21_lm_backoff", "avg_logprob") -> libm,
    ("t22_source_drift", "kl_nats") -> libm,
    ("t24_bpe_fertility", "fertility") -> ratio,
    ("t24_bpe_fertility", "compression") -> ratio,
    ("t25_heaps_law", "beta") -> libm,
    ("t25_heaps_law", "lnk") -> libm,
    ("t25_heaps_law", "r2") -> libm,
    ("t26_burstiness", "vmr") -> ratio,
    ("t27_pmi_collocations", "pmi") -> libm,
    ("t28_jsd_drift", "jsd_nats") -> libm,
    // --- streaming ----------------------------------------------------
    ("w01_tumbling_window", "sum_value") -> decCast,
    ("ws07_tws_topk", "v1") -> pass,
    ("ws07_tws_topk", "v2") -> pass,
    ("ws11_stream_psi", "psi") -> libm,
    // --- kll quantile ---------------------------------------------------
    ("q72_kll_quantile_merge", "q") -> pass,
    ("q72_kll_quantile_merge", "value") -> pass,
    // --- sketch-store answers (q92b: exact order statistics at integer
    // ceiling ranks + a literal quantile label; the KLL estimate enters
    // only through the within_rank_eps flag) -----------------------------
    ("q92b_store_quantiles", "q") -> pass,
    ("q92b_store_quantiles", "value") -> pass,
    // ws14: q92b's surface driven against the stream-maintained
    // batch-id-sharded store (same shared QuantileRankGate assembly)
    ("ws14_stream_kll_shards", "q") -> pass,
    ("ws14_stream_kll_shards", "value") -> pass
  )
}
