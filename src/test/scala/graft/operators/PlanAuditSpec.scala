package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Automated plan-regression net: the BENCH.md plan audits, as assertions.
  *
  * Every batch query's physical plan must be free of unbounded cross
  * products: `CartesianProduct` is banned outright, and
  * `BroadcastNestedLoopJoin` is allowed only where the design DELIBERATELY
  * broadcasts a bounded side (1-row scalar relations, K centroids, bounded
  * chunks). A refactor that silently turns an equi-join into a cross
  * product — the classic 100 TB plan regression — now fails `sbt test`
  * instead of surfacing in a bench.
  *
  * Streaming queries are excluded: invoking them drains a stream and the
  * returned relation is a memory-sink scan whose plan carries no join
  * shape.
  */
class PlanAuditSpec extends SparkSpec {

  /** Deliberate bounded broadcast-nested-loop sides, each documented at the
    * query: 1-row probe/total relations or K-row centroid/chunk tables.
    */
  private val boundedCross = Set(
    "q30_cosine_topk",   // 1-row probe vector
    "q60_cosine_pairs",  // bounded chunk (block-nested-loop by design)
    "q69_multi_topk",    // 5-row probe set
    "q82_tfidf",         // 1-row corpus-size N
    "q95_collocations",  // 1-row bigram total
    "q41_ann_ivf",       // K centroids + 1-row probe
    "q40_ann_lsh",       // K-plane signature relation
    "q72_embed_dedup",   // bounded chunk scan (q60 family)
    "q74_prep_pipeline", // 1-row stats relation in the composition
    "q53_train_test_split", // 1-row split-total relation
    "q62_stratified",    // 1-row per-stratum totals
    "q108_equidepth_scale", // 1-row broadcast decile-cutoff array
    "q393_ljung_box",    // 1-row series-moment relation
    "q401_keyness",      // 1-row corpus-total relation
    "q409_chow",         // 1-row pooled-RSS relation
    "q412_neyman_allocation", // 1-row weight-total + leftover relations
    "q414_twonn",        // bounded chunk scan (q60 family exact baseline)
    "q429_engle_granger", // 1-row cointegration-moment relation
    "q430_token_dispersion", // 10-row top-token × |sources| grid + 1-row totals
    "q431_hubness",      // bounded chunk scan (q60 family exact baseline)
    "q435_distance_concentration", // bounded chunk scan + 1-row contrast relation
    "q507_twonn_blocked", // K-centroid broadcast (q486's blocked candidate relation)
    "q508_hubness_blocked", // K-centroid broadcast (q486's blocked candidate relation)
    "q509_concentration_sampled", // bounded 256-id sample cut (<=32.6k pairs at any SF) + 1-row contrast relation
    "q516_nfc_dedup", // two 1-row dup-count relations attached to the 1-row total
    "q518_match_norm_dedup", // three 1-row dup-count relations (raw/NFC/match rungs) attached to the 1-row total
    "q436_ordinal_association", // 20-cell contingency self-pairing + 1-row total
    "q440_auc_delong",   // 1-row positive/negative total relation
    "q444_weibull_fit",  // 1-row latency-total relation
    "q420_friedman",     // 5-row type relation × day grid + 1-row totals
    "q423_anderson_darling", // 1-row total over the 100-value cent collapse
    "q425_cooks_distance", // 1-row OLS-moment + 1-row RSS relations
    "q426_breusch_pagan", // 1-row OLS-moment relation
    "q427_jarque_bera",  // 1-row OLS-moment relation
    "q413_hodges_lehmann", // bounded weekday-slot day grids (calendar-bounded)
    "q415_cliffs_delta", // 4-row source grid × bounded n_chars value domain
    "q402_js_divergence", // |sources|-row × |vocab|-row distribution grid
    "q403_cross_entropy", // |sources|-row train totals + 1-row vocab size
    "q396_durbin_watson", // 1-row OLS-moment + 1-row denominator relations
    "q397_hurst_rs",     // 1-row log-log OLS fit relation
    "q399_permutation_entropy", // 1-row triple-total + 1-row entropy relations
    "q111_mix_weights",  // 1-row broadcast weight-normalization total
    "q113_embed_dedup_blocked", // K-centroid broadcast (q41's IVF index)
    "q114_cosine_topk_blocked", // K-centroid broadcast (q41's IVF index)
    "q124_ann_ivf_batch", // probe-batch × K-centroid broadcast (bounded both sides)
    "q131_hard_negatives", // 5-row probe set (q69's kernel + label exclusion)
    "q135_corpus_datasheet", // 1-row broadcast corpus-chars total (q111's pattern)
    "q137_embed_margin", // K-row label-centroid broadcast (q92's kernel, all-labels scoring)
    "q138_vocab_coverage", // 6-row threshold relation x count-of-counts summary + 1-row total
    "q142_bm25", // 1-row (N, avgdl) totals broadcast (q82's pattern)
    "q144_rrf_fusion", // q142's 1-row totals broadcast via the shared BM25 kernel
    "q146_heavy_hitters", // 1-row broadcast token-count total gating the candidates
    "q148_bigram_lm", // 1-row broadcast vocab-size V in the smoothing denominator
    "q150_eval_quota", // 1-row broadcast corpus total + floor-sum relations
    "q151_matryoshka_topk", // 5-row probe set x2 (q69's kernel) + 50-row full-topk broadcast
    "q153_ann_ivf_foldin", // K-centroid broadcast (q41's IVF family: fold-in assignment + probe)
    "q154_lang_rebalance", // 1-row (N, L) totals broadcast deriving the thresholds
    "q178_ab_welch", // 1-row broadcast baseline-arm moments (view arm)
    "q180_assoc_rules", // 1-row broadcast n_orders total in the lift denominator
    "q186_column_profile", // per-column 1-row agg x 1-row TakeOrdered mode
    "q187_fk_audit", // per-edge 1-row child-total x 1-row orphan-count joins
    "q181_skyline", // 1-row min/max broadcast + non-equi dominance join over the pruned survivor set
    "q182_zorder", // 1-row min/max broadcast normalizing both curve dimensions
    "q196_hilbert", // same 1-row min/max normalization broadcast (q182's xy helper)
    "q188_ivfpq", // K-centroid + probe-row broadcasts (q41 IVF family x q172 PQ codebooks)
    "q204_benford", // 1-row broadcast digit-count total in the share denominator
    "q205_skew_report", // per-column 1-row summary x 1-row TakeOrdered top-key join
    "q207_rfm", // 1-row broadcast quintile-cut arrays scoring the per-user summary
    "q210_kaplan_meier", // 1-row broadcast corpus-horizon month joined to the per-customer summary
    "q211_phrase_search", // 1-row broadcast probe phrase selecting three posting lists
    "q213_decayed_topk", // 1-row broadcast corpus-horizon month in the decay exponent
    "q216_mutual_info", // 1-row broadcast grand total against the bounded 120-cell grid
    "q217_infogain_stump", // 1-row broadcast price-range normalizer for integer bucketing
    "q222_mmr_rerank", // 1-row probe broadcast + 20-row candidate pairwise-sim matrix
    "q223_knn_eval", // 100-row probe broadcast against one corpus scan (q69's TopKByScore plan)
    "q228_perplexity_eval", // 1-row broadcast train vocab-size V in the smoothing denominator (q148's pattern)
    "q235_gains_curve", // 10-row decile boundary relation range-joined to the bounded score summary
    "q236_seasonal_naive_eval", // 1-row broadcast horizon hour against the bounded hourly collapse
    "q245_share_of_parent", // 1-row broadcast grand total against the bounded 25-nation grain
    "q250_price_elasticity", // 1-row broadcast price-range normalizer (q217's bucketing)
    "q252_strict_funnel", // 1-row broadcast converting-user total appended to each row
    "q255_kcenter_coreset", // 1-row center broadcasts per greedy step (k=8 bounded steps)
    "q257_macro_f1", // q223's 100-row probe broadcast (shared kNN confusion chain)
    "q260_power_iteration", // 1-row max|u| broadcast normalizing the 64-row vector
    "q263_bootstrap_ci", // 1-row point-estimate broadcast beside the 32-row order stats
    "q266_cramers_v", // 1-row total + 1-row (r, c) dims broadcasts over the bounded grid
    "q283_decontam_sensitivity", // 1-row summary x 1-row train-total broadcasts, one per swept width
    "q276_silhouette", // K-row label-centroid broadcast (q137's all-labels kernel)
    "q277_brand_modularity", // 1-row edge-mass broadcast against the bounded brand grain
    "q291_cuped", // 1-row broadcast pre/post split timestamp
    "q292_simpsons_paradox", // 1-row broadcast pooled-correlation row for the flip compare
    "q294_minhash_quality_eval", // three 1-row count crossJoins composing the P/R report
    "q296_isotonic_calibration", // 1-row min/max broadcast + minimax triple join over the <=20-row bin summary
    "q298_negative_sampling", // 1-row max-partkey broadcast sizing the LCG draw domain
    "q299_maxsim_rerank", // 5-row probe broadcast against one corpus scan (q30's family)
    "q302_ranker_agreement", // the same 5-row probe broadcast scoring both rankers in one pass
    "q304_hits", // 1-row max broadcasts normalizing each HITS half-step
    "q305_voptimal_histogram", // <=20-row cum relation triple non-equi join (bounded combos) + 1-row totals
    "q306_target_encoding", // 1-row broadcast global prior
    "q309_lexical_diversity", // 1-row broadcast adaptive corpus-mean threshold
    "q311_join_cardinality", // 1-row totals x 1-row top-100 summary audit
    "q312_quantile_normalization", // 9-row decile broadcast x bounded cum summaries + 1-row pooled total
    "q297_ks_pairwise", // 10-row type-pair broadcast tagging the per-value collapse; 5x5 pair build
    "q317_brier_decomposition", // 1-row global (n, ybar) broadcast against the 10-bin grid + 1-row contribution sums
    "q325_disparate_impact", // 1-row max-rate broadcast against the 5-segment summary
    "q327_att_matching", // 1-row treated-count broadcast beside the 1-row matched summary
    "q328_jackknife_ratio", // 1-row (Y, X, n) total broadcast onto the user summary + 1-row reduction
    "q330_bloom_fpr", // 1-row bits/members counts composing the single report row
    "q331_two_proportion_z", // 1-row pooled-total broadcast against the 5-segment summary
    "q333_psi", // 1-row midpoint + totals broadcasts against the 10-bin grid, 1-row psi attach
    "q334_cohens_d", // 5-row moment summary pairwise self-join (bounded type domain, q297's shape)
    "q338_consistent_hashing", // 1-row sorted-ring-array broadcast onto the key scan + 1-row load summary
    "q340_stratified_ate", // 1-row used-strata totals/terms broadcasts composing the single report row
    "q341_group_sequential", // 1-row date-range broadcast assigning calendar looks
    "q344_qte", // 9-row decile broadcast x bounded per-arm bucket summaries
    "q346_permutation_test", // 32-row rep broadcast (declared 32x scan) + 1-row obs/extreme composition
    "q347_degree_assortativity", // 1-row node-count broadcast beside the 1-row moment reduction
    "q349_dispersion", // 1-row source-count broadcast onto the per-token moment collapse
    "q350_range_partition_audit", // 1-row row-total broadcast onto the bounded bucket collapse
    "q351_shapley_attribution", // 8-row lattice relations + 1-row attributable total (bounded coalition walk)
    "q352_james_stein", // 1-row grand-total and tau2 broadcasts over the 5-segment summary
    "q357_nelson_aalen", // 1-row horizon broadcast (q210's censoring convention)
    "q359_qini_curve", // 10-row decile broadcast x bounded prefix relation + 1-row full-curve anchor
    "q360_self_bleu", // 1-row (corpus mass, source count) broadcast onto the 20-row clip summary
    "q367_periodogram", // 23-row candidate-period broadcast onto the bounded hourly collapse
    "q382_ccf", // 25-row lag broadcast onto the bounded hourly collapse
    "q385_heaps_law", // 16-row power-of-two checkpoint broadcast
    "q392_burrows_delta", // 50-row top-token broadcast onto the bounded source relation
    "q394_hill_tail", // 1-row threshold broadcast onto the 501-row TakeOrdered relation
    "q386_lang_confusion", // 1-row macro-F1 broadcast onto the <=5-class rows
    "q387_knn_label_accuracy", // 200-row probe broadcast (the q69 multi-probe shape)
    "q379_ipw_ate", // 1-row bucket-count anchor beside the IPW totals
    "q361_mann_whitney", // 1-row agg x 1-row tie-sum composition over the bounded bucket summary
    "q362_kruskal_wallis", // 1-row totals x 1-row tie-sum x 1-row group-count composition
    "q363_wasserstein", // 1-row (N1, N2) totals broadcast onto the bounded cent-support steps
    "q365_fdr_bh", // 1-row family-size m broadcast onto the <=|event types|-row p-value relation
    "q369_log_rank", // 1-row horizon broadcast (q210's censoring convention)
    "q370_rdd", // 1-row left-fit x 1-row right-fit composition
    "q450_mood_median", // 1-row pooled-median and totals broadcasts onto the bounded cent collapse / 5-segment relation
    "q455_dunns_test", // 5-row group-summary self-join + 1-row totals/ties broadcasts (q334's bounded pair shape)
    "q459_sample_entropy", // (calendar-bounded)^2 template pair join (q413's shape) + 1-row tolerance broadcast
    "q461_spiegelhalter_z", // handled in Evaluation: no cross product (single agg) — listed defensively for the 1-row composition
    "q462_rich_club", // 3-row percentile-threshold broadcast onto degrees/edges + 1-row node-total broadcast
    "q466_t_closeness", // bounded global-bucket relation (~12 rows) broadcast onto the 125-class relation + 1-row totals
    "q467_page_trend", // 1-row block-count broadcast onto the 7-slot reduction (q456's shape)
    "q468_jonckheere", // 1-row group-totals broadcast onto the single J reduction
    "q470_theil_decomposition", // 1-row corpus totals + 5-row group summary broadcasts onto the scan
    "q471_spectral_entropy", // 23-row period broadcast (q367's shape) + 5-row per-type total broadcast
    "q472_markov_entropy_rate", // bounded |types|^2 transition relation + 1-row state-count broadcasts
    "q473_knee_detection", // 1-row (K, X) totals broadcast onto the TakeOrdered-bounded 1000-row curve
    "q474_pruning_selectivity", // 1-row min/max stats + 16-row probe broadcasts onto the 64-file summaries (q182/q183's shape)
    "q476_sampled_quantile_error", // 1-row totals broadcast onto the bounded cent-support collapses (q363's argument)
    "q478_lof", // bounded embedding-relation pair kernel (the q414/q435 declared exact baseline; IVF-blocked at corpus scale)
    "q480_mahalanobis", // 1-row moment broadcast onto the calendar-bounded day grid
    "q481_gmm_1d", // 1-row EM-parameter broadcasts onto the bounded cent collapse (5 unrolled iterations)
    "q456_kendalls_w", // 1-row sums/ties/ranker-count broadcasts composing the single report row over the 35-cell relation
    "q457_variance_ratio", // 1-row totals broadcast onto the calendar-bounded day grid + 1-row moment compositions
    "q458_kpss", // 1-row totals broadcast onto the calendar-bounded day grid + 1-row A/B/G compositions
    "q452_energy_distance", // 1-row midpoint + (N1,N2) totals broadcasts onto the bounded cent-support steps (q363's shape)
    "q453_cramer_von_mises", // 1-row (N1,N2) totals broadcast onto the bounded $10-bucket steps (q361's support)
    "q454_nominal_association", // 1-row margin/entropy broadcasts composing the single report row over the <=20-cell relation
    "q487_matrix_profile", // subsequence pair kernel over the calendar-bounded day grid (~2.4k windows -> ~5.8M pairs at any SF), never the orders
    "q488_kneser_ney", // 1-row bigram-type total broadcast onto the per-type stats join
    "q489_srp_distortion", // 63-row plane grid onto the dim explode + bounded id<200 pair cut (<=19.9k pairs) + 1-row p90 broadcast
    "q490_cusum_alarm", // 1-row (n, sum) totals broadcast onto the calendar-bounded day grid
    "q492_bootstrap_ci", // 32-row replica grid onto the order scan + 1-row point/lo/hi broadcasts
    "q495_binary_segmentation", // 1-row totals + 2-row segment relation onto the calendar-bounded prefix grid
    "q502_shapley_r2", // three 1-row between-SS aggregates composed onto the 1-row totals
    "q504_effect_sizes", // 2-row group relation + bounded k$-support dominance cross + 1-row broadcasts
    "q505_tukey_hsd", // 5x5 segment pair relation + 1-row MSW broadcast
    "q506_twoway_anova", // 1-row marginal/cell between-SS aggregates onto the 1-row totals
    "q493_seasonal_decompose", // 1-row strength broadcast onto the 7-row weekday collapse
    "q183_minmax_prune") // 1-row broadcast true-row total appended to the 2-row audit

  /** Queries allowed to plan an un-partitioned Window (single-partition
    * sort). Three are the documented EXACTNESS baselines whose scale twins
    * (q108/q109/q110) avoid the global window entirely; the rest run the
    * global window over a provably bounded relation, noted per entry.
    * Everything else planning `WindowExec` with an empty partitionSpec
    * fails — that's the classic silent 100 TB scale regression.
    */
  private val globalWindowAllowed = Map(
    "q91_equidepth_bins" -> "exactness baseline; scale twin q108",
    "q93_key_gaps" -> "exactness baseline; scale twin q109",
    "q96_sample_packing" -> "exactness baseline; scale twin q110",
    "q109_key_gaps_scale" -> "window over the <=numPartitions-row boundary summary",
    "q138_vocab_coverage" -> "cumsum over the count-of-counts summary (distinct frequency values, O(sqrt mass) rows), never the vocab relation",
    "q144_rrf_fusion" -> "row_number over the two TakeOrdered-bounded <=100-row top-k relations, never the corpus",
    "q150_eval_quota" -> "apportionment rank over the bounded (lang x source) cell relation, never the docs",
    "q181_skyline" -> "running max over the <=256-row price-bucket summary, never the parts",
    "q190_auc" -> "cumsum over the bounded (score -> counts) summary (2-decimal score domain, the q138 count-of-counts argument), never the rows",
    "q210_kaplan_meier" -> "at-risk/product-limit cumsums over the duration GRID (one row per distinct lifetime month, bounded by the corpus month span), never the customers",
    "q235_gains_curve" -> "prefix sums over the bounded (score -> counts) summary (q190's 2-decimal-domain collapse), never the rows",
    "q239_rank_movers" -> "rank windows over the bounded top-100 TakeOrdered relation, never the catalog",
    "q271_sql_surface" -> "row_number over the TakeOrdered-bounded 10-row top relation, never the order population",
    "q285_dup_growth" -> "cumsum over the bounded source-rank grid (~20 rows at any volume), never the documents",
    "q296_isotonic_calibration" -> "cumsum over the <=20-row bin summary, never the events",
    "q305_voptimal_histogram" -> "cumulative moments over the <=20-row bin summary, never the events",
    "q312_quantile_normalization" -> "pooled cumsum over the bounded distinct-length summary (q138's count-of-counts argument), never the documents",
    "q336_feature_auc_scan" -> "q190's cumsum over each bounded (feature value -> counts) summary (value domains: 7/24/16 buckets and the 2-decimal score grid), never the rows",
    "q339_zipf_slope" -> "rank window over the TakeOrdered-bounded 1000-row top-token relation, never the token stream",
    "q341_group_sequential" -> "cumulative sums over the 5-row look collapse, never the orders",
    "q350_range_partition_audit" -> "prefix counts over the bounded 10.00-bucket collapse (price-domain bounded, the q312/q344 argument), never the orders",
    "q357_nelson_aalen" -> "at-risk/hazard cumsums over the duration GRID (one row per distinct lifetime month, bounded by the corpus month span — q210's argument), never the customers",
    "q359_qini_curve" -> "prefix sums over the bounded 10.00-bucket collapse DESC (q350's argument), never the orders",
    "q361_mann_whitney" -> "rank cumsum over the bounded $10-bucket collapse (price-domain bounded, the q344/q350 argument), never the orders",
    "q362_kruskal_wallis" -> "the q361 rank cumsum over the same bounded bucket collapse",
    "q363_wasserstein" -> "CDF cumsums + lead over the bounded cent-support collapse (value domain <= 3300 cents), never the events",
    "q365_fdr_bh" -> "BH step-up rank over the <=|event types|-row p-value relation",
    "q369_log_rank" -> "reverse at-risk cumsums over the duration GRID (q210's bounded month-span argument), never the customers",
    "q393_ljung_box" -> "Q-statistic cumsum over the 10-row lag-moment relation, never the orders",
    "q397_hurst_rs" -> "row_number over the calendar-bounded day GRID (~2400 rows at any SF, the q210 argument), never the orders; block R/S windows are partitioned",
    "q398_allan_variance" -> "row_number over the <=31-row event-day grid, never the events",
    "q399_permutation_entropy" -> "row_number over the calendar-bounded day GRID (the q210/q397 argument), never the orders",
    "q400_page_hinkley" -> "PH cumsums over the <=31-row event-day grid, never the events",
    "q411_rbo" -> "rank windows over the two TakeOrdered-bounded 50-row top-part relations (q239's argument), never the lineitems",
    "q412_neyman_allocation" -> "largest-remainder rank over the 5-row stratum relation",
    "q413_hodges_lehmann" -> "lower-median rank over the (calendar-bounded weekday slots)² pair relation (~343² rows at any SF), never the orders",
    "q423_anderson_darling" -> "EDF cumsum over the 100-value cent-domain collapse (the q190/q363 argument), never the orders",
    "q424_spearman" -> "tie-averaged rank windows over the <=31-row day grid, never the events",
    "q429_engle_granger" -> "level cumsums over the <=31-row day grid, never the events",
    "q439_rolling_beta" -> "8-day rolling moment windows over the <=31-row day grid, never the events",
    "q440_auc_delong" -> "structural-component cumsums over the bounded (score -> counts) summary (q190's argument), never the rows",
    "q443_turning_points" -> "row_number over the calendar-bounded day GRID (the q210/q397 argument), never the orders",
    "q444_weibull_fit" -> "median-rank cumsum over the <=130-value latency collapse (the q190/q363 argument), never the lineitems",
    "q450_mood_median" -> "pooled-median cumsum over the bounded cent-value collapse (balance domain <= 1.1M cents, the q363 argument), never the customers",
    "q455_dunns_test" -> "the q361/q362 rank cumsum over the same bounded $10-bucket collapse",
    "q462_rich_club" -> "degree-percentile cumsum over the bounded degree-support collapse (distinct degrees, the q138 count-of-counts argument), never the edges",
    "q473_knee_detection" -> "rank + cumsum over the TakeOrdered-bounded 1000-row revenue curve (q239/q339's argument), never the catalog",
    "q476_sampled_quantile_error" -> "decile cumsums over the bounded cent-support collapses (value domain <= 3300 cents, the q363 argument), never the events",
    "q479_dbscan_1d" -> "gaps-and-islands lag/cumsum over the bounded cent-support collapse (the q363 argument), never the events",
    "q463_jaro_winkler_pairs" -> "tier rank over the jw>=0.94 DISTINCT-name-pair relation (name-deduped collapse, |distinct names|^2 per block), never the part pairs",
    "q481_gmm_1d" -> "quartile-init cumsum over the bounded cent-support collapse (the q363 argument), never the events",
    "q457_variance_ratio" -> "5-day rolling sum + count over the calendar-bounded day grid (the q397/q429 argument), never the orders",
    "q458_kpss" -> "partial-sum cumsum over the calendar-bounded day grid (the q397/q429 argument), never the orders",
    "q452_energy_distance" -> "CDF cumsums + lead over the bounded cent-support collapse (q363's value domain), never the events",
    "q453_cramer_von_mises" -> "CDF cumsums over the bounded $10-bucket collapse (q361's price-domain argument), never the orders",
    "q487_matrix_profile" -> "row_number + 7-row subsequence windows over the calendar-bounded day GRID (the q210/q397 argument), never the orders",
    "q489_srp_distortion" -> "p90 rank window over the bounded id<200 pair cut (<=19.9k rows at any SF), never the corpus",
    "q490_cusum_alarm" -> "CUSUM prefix-sum + running-min over the calendar-bounded day grid (the q397/q429 argument), never the orders",
    "q492_bootstrap_ci" -> "percentile rank over the 32-row replica-mean relation, never the orders",
    "q493_seasonal_decompose" -> "centered 7-day MA window over the calendar-bounded day grid (the q397/q429 argument), never the orders",
    "q494_granger_causality" -> "lag-1 window over the calendar-bounded day grid (the q397/q429 argument), never the orders",
    "q495_binary_segmentation" -> "prefix cumsums + argmin rank over the calendar-bounded day grid (the q397/q429 argument), never the orders",
    "q504_effect_sizes" -> "top-2 rank over the 5-row segment-moment relation, never the orders")

  private val streaming = Set(
    "q45_stream_tumbling", "q46_stream_sessions", "q54_stream_sliding",
    "q55_stream_dedup", "q66_stream_stateful", "q71_stream_join",
    "q83_stream_outer_join", "q98_stream_merge", "q101_stream_static",
    "q121_stream_incremental_dedup", "q140_stream_drift",
    "q152_stream_decontam", "q155_stream_ingest_dedup",
    "q158_stream_decontam_rewrite", "q192_stream_auc",
    "q201_stream_changepoint", "q219_stream_topk", "q264_stream_kanonymity",
    "q265_stream_bollinger", "q284_stream_benford", "q288_stream_funnel",
    "q295_stream_ema", "q300_stream_isotonic", "q303_stream_maxsim",
    "q307_stream_negatives", "q320_stream_kappa", "q326_stream_fd",
    "q329_stream_srm", "q337_stream_psi", "q348_stream_mann_kendall",
    "q354_stream_permutation", "q375_stream_wasserstein",
    "q376_stream_ewma", "q390_stream_runs",
    "q417_stream_page_hinkley", "q418_stream_js_drift",
    "q434_stream_spearman", "q437_stream_ljung_box", "q441_stream_hurst",
    "q465_stream_energy", "q469_stream_t_closeness",
    "q477_stream_spectral_entropy", "q484_stream_gmm",
    "q498_stream_cusum", "q499_stream_matrix_profile", "q500_stream_granger")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (name, _) => streaming(name) }
    .foreach { case (name, fn) =>
      test(s"$name plan has no unbounded cross product") {
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct — an unbounded cross join reached the physical plan")
        if (!boundedCross(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin but is not in the documented bounded-broadcast set")
      }
      if (!globalWindowAllowed.contains(name))
        test(s"$name plans no un-partitioned Window") {
          val global = globalWindows(fn(spark, sf0001).queryExecution.executedPlan)
          assert(global.isEmpty,
            s"$name plans a Window with no PARTITION BY — every row moves to one " +
              s"partition (the silent scale regression); partition it or document " +
              s"it in globalWindowAllowed:\n${global.mkString("\n")}")
        }
    }

  /** Collect un-partitioned Window operators, descending through
    * AdaptiveSparkPlanExec — a plain `collect` on the AQE root sees no
    * children and would pass VACUOUSLY.
    */
  private def globalWindows(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case other => other.children
    }
    val here = p match {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => Seq(w)
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty => Seq(w)
      case _ => Nil
    }
    here ++ kids.flatMap(globalWindows)
  }

  test("window audit traversal actually sees global windows (not vacuous)") {
    // q91 is the documented global-ntile exactness baseline: the traversal
    // MUST find its un-partitioned window, or every pass above is meaningless
    val exec = SparkEntry.queries("q91_equidepth_bins")(spark, sf0001)
      .queryExecution.executedPlan
    assert(globalWindows(exec).nonEmpty,
      "traversal failed to find q91's global window — the audit is blind")
  }

  /** The BENCH.md plan audits as regression tests: pushdown, broadcast and
    * top-k physical shapes the design relies on at 100 TB. A silent
    * Catalyst behavior change (or a refactor dropping a filter below a
    * barrier) now fails `sbt test` instead of surfacing in a bench.
    */
  private def executedPlanOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q01/q02 scans push their filters into the parquet source") {
    for (q <- Seq("q01_scan_filter", "q02_string_pred")) {
      val plan = executedPlanOf(q)
      assert(plan.contains("PushedFilters: ["),
        s"$q plan carries no PushedFilters section")
      assert(!plan.contains("PushedFilters: []"),
        s"$q pushed an EMPTY filter list to the scan — predicate pushdown regressed")
    }
  }

  test("q23 scan prunes to the referenced columns (no full-width read)") {
    // q23 is filterless by design; its scan discipline is COLUMN pruning —
    // 6 referenced lineitem columns, not the table's full 16-column width
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case other => other.children
      }
      (p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s.output.length)
        case _ => Nil
      }) ++ kids.flatMap(scans)
    }
    val widths = scans(SparkEntry.queries("q23_math")(spark, sf0001).queryExecution.executedPlan)
    assert(widths.nonEmpty, "q23 plans no parquet FileScan")
    assert(widths.forall(_ <= 6),
      s"q23's scan reads ${widths.max} columns — column pruning regressed (needs 6)")
  }

  test("q04 star join broadcasts its dimension sides") {
    val plan = executedPlanOf("q04_star_join")
    assert(plan.contains("BroadcastHashJoin"),
      "q04's dimension joins must be broadcast hash joins (small dims, big fact)")
    assert(!plan.contains("SortMergeJoin"),
      "q04 planned a SortMergeJoin — a dim side exceeded the broadcast threshold " +
        "or a hint was lost; at 100 TB this shuffles the fact table five times")
  }

  test("q19/q30 top-k queries plan TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q19_topk", "q30_cosine_topk")) {
      val plan = executedPlanOf(q)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q must plan TakeOrderedAndProject (per-partition heap + driver merge); " +
          s"a global Sort+Limit materializes the full order")
    }
  }

  // ——— round-5 scale twins: the exchange shapes their 100 TB argument
  // rests on, pinned as regression tests (r5 VERDICT item 7) ———

  /** Count physical operators by walking through the AQE root (same
    * non-vacuity discipline as [[globalWindows]]).
    */
  private def collectOps(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case other => other.children
    }
    p +: kids.flatMap(collectOps)
  }

  test("q108 sketch shape: the ONLY single-partition exchange carries sketch partials") {
    // the twin's claim: no row-wide relation funnels through one partition —
    // the sole SinglePartition exchange moves the bounded GK-sketch partials
    // (one row per input partition), never the data. Exchanges live only in
    // the AQE plan's string rendering (initialPlan), so this test matches
    // the rendered tree like the pushdown/broadcast tests above.
    val lines = SparkEntry.queries("q108_equidepth_scale")(spark, sf0001)
      .queryExecution.executedPlan.toString.linesIterator.toSeq
    val singleParts = lines.zipWithIndex
      .filter(_._1.contains("Exchange SinglePartition"))
    assert(singleParts.length == 1,
      s"q108 plans ${singleParts.length} single-partition exchanges (expect exactly " +
        s"1: the sketch-partial merge); a second one means rows started funneling:\n" +
        lines.mkString("\n"))
    // and the sketch partials are what feeds it: the exchange's child (the
    // next rendered line) is the partial approx_percentile aggregate, not a
    // row-wide relation
    val child = lines(singleParts.head._2 + 1)
    assert(child.contains("partial_approx_percentile"),
      s"q108's single-partition exchange no longer carries the sketch partials: $child")
  }

  test("q109 materializes its windowed relation once for both consumers") {
    // the scan → distinct → range-exchange → window chain is the dominant
    // cost; it must run ONCE behind the checkpoint. If the materialization
    // is dropped, the chain re-plans per consumer: parquet scans and the
    // partitioned lag window reappear in the final plan, and this fails.
    val exec = SparkEntry.queries("q109_key_gaps_scale")(spark, sf0001)
      .queryExecution.executedPlan
    val ops = collectOps(exec)
    val parquetScans = ops.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(parquetScans.isEmpty,
      s"q109's final plan re-scans parquet ${parquetScans.length}× — the windowed " +
        "relation is no longer materialized once")
    val rddScans = ops.count(_.nodeName.contains("ExistingRDD"))
    assert(rddScans >= 2,
      s"q109 plans $rddScans checkpoint scans (expect >=2: the inner-gap and " +
        "boundary consumers of the one materialized relation)")
    val windows = ops.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.length == 1,
      s"q109 plans ${windows.length} Window operators (expect exactly 1: the " +
        "boundary lag over <=numPartitions summary rows; the inner window runs " +
        "once at materialization)")
  }

  test("q115 materializes its pair relation once for both aggregations") {
    // pair generation (the prefix-filtered Jaccard join chain) is the
    // expensive part; both the pair-count and distinct-doc aggregations must
    // consume ONE checkpointed relation, not re-run the join chain
    val ops = collectOps(SparkEntry.queries("q115_cross_source_leakage")(spark, sf0001)
      .queryExecution.executedPlan)
    val parquetScans = ops.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(parquetScans.isEmpty,
      s"q115's final plan re-scans parquet ${parquetScans.length}× — the pair " +
        "relation is no longer materialized once")
    val rddScans = ops.count(_.nodeName.contains("ExistingRDD"))
    assert(rddScans >= 2,
      s"q115 plans $rddScans checkpoint scans (expect >=2: the n_pairs and " +
        "n_docs consumers of the one materialized pair relation)")
  }
}
