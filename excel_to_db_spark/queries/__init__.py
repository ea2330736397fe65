"""Query/operator registry package (the driver-contract backing store).

Importing this package populates :data:`REGISTRY` through the operator
modules' registration side effects — each module decorates its functions
with :func:`excel_to_db_spark.queries.registry.query`. ``__spark_entry__``
exposes the result via ``queries()`` / ``oracle_sql()``.
"""

from .registry import REGISTRY, QuerySpec, oracle_sqls, query, spark_queries

# Registration side effects — each import adds its operators to REGISTRY.
from . import relational  # noqa: E402,F401  Tier B: scans/joins/aggs/windows/setops
from . import relational2  # noqa: E402,F401  Tier B: order stats/lateral/maps/intervals/regexp
from . import relational3  # noqa: E402,F401  Tier B: NULL semantics/division/gaps/frame emulation
from . import functions   # noqa: E402,F401  Tier B: scalar function packs + UDF/approx
from . import extensions  # noqa: E402,F401  Tier C: dedup/similarity/text/multimodal/streaming
from . import parity      # noqa: E402,F401  Tier A: excel scan/load/display/csv golden parity
from . import roundtrip   # noqa: E402,F401  Tier A sinks widened: sqlite/csv/jsonl round trips
from . import tpch        # noqa: E402,F401  Tier B: TPC-H-derived warehouse suite
from . import pipeline    # noqa: E402,F401  Tier C: training-data pipeline composites
from . import warehouse2  # noqa: E402,F401  Tier B/C: basket/markov/interp/pareto/MAD
from . import events_graph  # noqa: E402,F401  Tier C: rolling anomaly/inter-arrival/pagerank
from . import warehouse3  # noqa: E402,F401  Tier B/C: growth/concurrency/rolling median
from . import operational  # noqa: E402,F401  Tier B/C: CDC merge/WAU/attribution
from . import stats_tests  # noqa: E402,F401  Tier B/C: welch-t/chi2/regr_*/path mining
from . import warehouse4  # noqa: E402,F401  Tier B/C: profiling/benford/diff/keyset/rank moves
from . import warehouse5  # noqa: E402,F401  Tier B/C: re-agg/SCD2/cumulative distinct
from . import storage     # noqa: E402,F401  Storage layout: bucketed join, ORC/xlsx round trips
from . import sources_ext  # noqa: E402,F401  XML/binaryFile/text sources + foreachBatch sink
from . import quality     # noqa: E402,F401  DQ expectations/triangles/zorder/reservoir/decontam
from . import tokenizer   # noqa: E402,F401  Tier C: BPE merge training + vocabulary apply
from . import sql_features  # noqa: E402,F401  Spark 4 surface: scripting/params/ps API/DPP
from . import curation     # noqa: E402,F401  Tier C: epoch shuffle/shard pack/mixture/chunk dedup/bloom join
from . import curation2    # noqa: E402,F401  Tier C: split census/source dup matrix/winnowing
from . import similarity2  # noqa: E402,F401  Tier C: product-quantization ANN
from . import curation3    # noqa: E402,F401  Tier C: Gopher rules/DSIR selection/neighbor Jaccard
from . import estimation   # noqa: E402,F401  Tier C: KMV sketch/salted join/BH-FDR/t-closeness/k-core
from . import evalml      # noqa: E402,F401  Tier C: kappa/ECE/capture-recapture/EB shrinkage
from . import mlcls       # noqa: E402,F401  Tier C: naive Bayes/info-gain split/AP/McNemar
from . import stats_assoc  # noqa: E402,F401  Tier C: Cramér's V/moments/randomized response/Friedman
from . import evalml2     # noqa: E402,F401  Tier C: silhouette/HITS/Cohen's d/Brier decomposition
from . import recsys_ts   # noqa: E402,F401  Tier C: i2i covisitation/Krippendorff/PACF/compound index
from . import evalops     # noqa: E402,F401  Tier C: pass@k/overdispersion/SLO burn/Bradley-Terry
from . import warehouse6  # noqa: E402,F401  Tier C: OHLC/runs test/modularity/CV stump
from . import stats_np    # noqa: E402,F401  Tier C: Kruskal-Wallis/CMH/Youden/stream OHLC
from . import evalsurv    # noqa: E402,F401  Tier C: isotonic PAV/log-rank/drawdown/confusion panel
from . import textops2    # noqa: E402,F401  Tier C: ROUGE-N/VaR-CVaR/Little's law/target encoding
from . import seqml       # noqa: E402,F401  Tier C: SPRT/AdaBoost/Bollinger/TOST
from . import infotheory  # noqa: E402,F401  Tier C: entropy rate/KL matrix/RBO/TVD-MI
from . import audit       # noqa: E402,F401  Tier C: median CI/burstiness/Simpson audit/fairness
from . import tsdiag      # noqa: E402,F401  Tier C: Jarque-Bera/Durbin-Watson/Ljung-Box/G-test
from . import pairedstats  # noqa: E402,F401  Tier C: sign test/Wilcoxon signed-rank/Cochran Q/Fleiss kappa
from . import reliability  # noqa: E402,F401  Tier C: Kendall W/Cronbach alpha/ICC/rank-sum AUC
from . import inequality   # noqa: E402,F401  Tier C: Theil/Atkinson indices, Good-Turing, Chao1
from . import extremes     # noqa: E402,F401  Tier C: Gumbel maxima/Hurst R-S/Grubbs/Page-Hinkley
from . import offpolicy    # noqa: E402,F401  Tier C: IPS-SNIPS/bandit replay/catalog coverage/Apdex
from . import textprofile  # noqa: E402,F401  Tier C: syllable census/Yule K/lexical profile/rank turbulence
from . import graphdiag    # noqa: E402,F401  Tier C: local clustering/reciprocity/Dickey-Fuller/Erlang C
from . import rates        # noqa: E402,F401  Tier C: Poisson rate ratio/two-prop z/jackknife SE/Cohen's h
from . import posthoc      # noqa: E402,F401  Tier C: Dunn post-hoc/Nelson-Aalen/Granger/sharp RD
from . import sketchml     # noqa: E402,F401  Tier C: KMV Jaccard/Bloom FPR/linear counting/logistic Newton
from . import regdiag      # noqa: E402,F401  Tier C: Huber M/Cook's distance/ridge path/Breusch-Pagan
from . import structure    # noqa: E402,F401  Tier C: isotropy/power-law alpha/periodogram/multiclass MCC
from . import flowdiag     # noqa: E402,F401  Tier C: stream Apdex/heartbeat gaps/rolling beta/Shapley MTA
from . import curaudit     # noqa: E402,F401  Tier C: source novelty/dedup length bias/CCF/Hodges-Lehmann
from . import spectra      # noqa: E402,F401  Tier C: variance spectrum/depth-2 CART/AR halflife/rich club
from . import qualpanel    # noqa: E402,F401  Tier C: FD census/time-to-convert/QQ deciles/trimmed mean
from . import finpanel     # noqa: E402,F401  Tier C: e-process/Sharpe-Sortino-Calmar/Fisher index/Yuen t
from . import resample     # noqa: E402,F401  Tier C: block bootstrap/Fisher z/post-stratify/WoE-IV
from . import temporal     # noqa: E402,F401  Tier C: circular Rayleigh/LLR keyness/turning points/DOW-hour grid
from . import metapanel    # noqa: E402,F401  Tier C: DL meta-analysis/Theil decomposition/Fano curve/means panel
from . import opspanel     # noqa: E402,F401  Tier C: learning curve/GB burstiness/top-k coverage/MTBF-MTTR
from . import posthoc2     # noqa: E402,F401  Tier C: Cochran-Armitage/Tukey HSD/cost threshold/design effect
from . import shapepanel   # noqa: E402,F401  Tier C: Lorenz deciles/b-bit minhash/long tail/Bowley-Moors
from . import classic2     # noqa: E402,F401  Tier C: ANCOVA/ARCH LM/split-half reliability/Mood median
from . import finalpanel   # noqa: E402,F401  Tier C: unicity/kernel regression/DAU stickiness/entropy curve
from . import stylo        # noqa: E402,F401  Tier C: Burrows Delta/Page trend/Weibull fit/Heaps law
from . import sweeps       # noqa: E402,F401  Tier C: attribution windows/vote ensemble/2x2 panel/shingle sweep
from . import lastpanel    # noqa: E402,F401  Tier C: Cp-Cpk/Benford 2nd digit/return gaps/weight disparity

# The round driver verifies the FIRST 50 registry keys (iteration order);
# everything else only gets the local tools/check.py run. Round-5 window
# (rotated per VERDICT r4 #4): the nine keys whose oracles/projections
# changed this round, then 41 keys that have NEVER had a driver
# CORRECTNESS row, risk-ranked (float statistics > warehouse/TS >
# relational NULL/frame semantics > storage round trips). Rounds 2-4
# drove the relational surface, TPC-H, function packs, streaming family,
# and LLM-pipeline flagships green; they follow in registration order
# and stay covered by the local gate.
_PRIORITY: tuple[str, ...] = (
    # ---- Round-5 window (VERDICT r4 #1/#4). First: every key whose
    # contract changed this round — the three r4 hash-fails (values
    # were exact; the oracle's numeric type class was wrong) plus the
    # latent instances the type-faithful local gate then flushed out.
    "jsonl_roundtrip", "tpch_q12", "math_funcs", "group_mad_outliers",
    "sql_parameterized", "sql_declared_udf", "agg_decimal_exact",
    "stats_anova_f", "multimodal_phash",
    # ---- Never-driver-sampled keys (139 before this round), risk-
    # ranked: float-heavy statistics first (the class the r4 audit
    # flagged), then warehouse/time-series, relational NULL/frame
    # semantics, and storage/source round trips.
    "stats_welch_t", "stats_mannwhitney", "stats_cuped",
    "stats_kaplan_meier", "stats_ols_multi", "stats_benford",
    "agg_regression", "agg_corr_matrix", "agg_gini",
    "agg_weighted_median", "agg_mode", "agg_histogram",
    "basket_affinity",  # r4 bench REGRESSION flag — needs a driver row
    "events_markov", "ts_interpolate", "pareto_share", "window_ewma",
    "window_rolling_median", "mom_growth", "interval_concurrency",
    "rolling_wau", "attribution_last_touch", "supplier_herfindahl",
    "ts_seasonal_decompose", "ts_autocorrelation",
    "map_funcs", "interval_arith", "regexp_pack", "set_bag_ops",
    "window_ignore_nulls", "anti_join_nulls", "join_null_safe",
    "relational_division", "sequence_gaps", "window_exclude",
    "window_groups_frame",
    "excel_roundtrip", "xml_roundtrip", "variant_json",
    "federated_union", "dynamic_partition_overwrite",
)


# Round-6 rotation TODO (97 keys with no driver CORRECTNESS row after
# r5; regenerate with: REGISTRY keys - CORRECTNESS_r0{1..5} keys -
# r5 _PRIORITY). Put ~50 of these first next round, prioritizing the
# streaming family, text/pipeline packs, Spark-4 surface keys, and the
# r5 curation pack (shuffle_epoch shard_pack mixture_interleave
# text_chunk_dedup join_bloom_pruned — registered after the window):
#   customer_rfm_scaled str_fuzzy_match skyline_pareto_front
#   window_range_trailing7d map_in_arrow cogroup_asof_pandas
#   udaf_grouped_pandas udtf_arrow dedup_minhash_est similarity_recall
#   events_session_dynamic stream_dedup_watermark stream_tumbling_append
#   join_asof_tolerance join_range stream_stream_left
#   events_latest_state events_funnel stream_topk_trending
#   dedup_containment dedup_incremental stream_scd2_enrich
#   embedding_pca_power stream_rocksdb_state dedup_cluster_eval
#   text_langid_eval stream_update_mode text_ngram_overlap text_idf
#   embedding_centroids text_repetition sample_stratified
#   text_vocab_mask sample_rebalance docs_length_quantile
#   group_zscore_pandas text_keywords text_pii_scrub text_entropy
#   text_bigram_lm embedding_outliers text_sparse_cosine
#   text_keyword_search sample_pps_systematic pipeline_data_card
#   events_rolling_anomaly events_inter_arrival graph_pagerank3
#   graph_bfs_levels attribution_position ts_forecast_baseline_eval
#   interval_concurrency_timeline events_path3 window_rolling_corr
#   group_quantile_normalize events_changepoint profile_columns
#   snapshot_diff keyset_pagination rank_movement time_rollup
#   price_index_laspeyres inventory_abc_xyz agg_reaggregation join_scd2
#   running_distinct_users range_partition_histogram
#   multimodal_binary_ingest text_source_lines stream_state_inspect
#   json_malformed_handling stream_foreachbatch csv_malformed_handling
#   dq_expectations graph_triangles zorder_layout sample_reservoir
#   decontam_traintest events_pattern hll_mergeable distinct_salted
#   winsorize_group observed_metrics text_compression_quality
#   graph_assortativity bpe_train_merges bpe_tokenize_corpus
#   sql_scripting pandas_on_spark_agg join_dpp_pruned
#   join_hint_shuffle_hash string_collation_group
# plus the round-5 early-session keys (after the window, also never
# sampled): bitmap_distinct_rollup sketch_count_min stats_ks_two_sample
#   stats_spearman xml_function_parse map_hof_funcs
# plus the round-5 batch-4 keys (registered after the window):
#   text_gopher_rules pipeline_dsir_weights graph_jaccard_neighbors
#   stats_levene similarity_ivfpq privacy_l_diversity stats_kendall
#   privacy_sensitivity_census embedding_drift_mmd
#   text_tokenizer_fertility stats_hill_tail_index
#   events_bot_heuristics dedup_quality_keep_best
# plus the round-5 batch-6/7 keys (estimation.py, registered after the
# window): sketch_kmv_distinct join_skew_salted stats_fdr_bh
#   privacy_t_closeness graph_kcore sketch_ams_f2
#   stats_permutation_test stats_diff_in_diff sample_neyman_allocation
# plus the round-5 batch-8 keys: similarity_mrr_eval
#   similarity_mmr_diversify eval_quality_gains
# plus the round-5 batch-9 keys: drift_psi mixture_unimax_budget
#   sql_group_order_all
# plus the round-5 batch-10 keys: stream_drift_psi text_zipf_fit
#   parquet_schema_evolution
# plus the round-5 batch-11 keys: text_bm25_search stats_anova_twoway
#   search_hybrid_rrf
# plus the round-5 batch-12 keys: graph_sssp_bellman dedup_soft_weights
# plus the round-5 batch-13 keys: text_perplexity_buckets
#   sample_negatives_contrastive
# plus the round-5 batch-14 keys: embedding_binary_quant
# plus the round-5 batch-15 keys: union_by_name_missing privacy_dp_median
# plus the round-5 batch-16 keys: ts_cusum_detection sample_kcenter_seeds
# plus the round-5 batch-17 keys: attribution_markov_removal
# plus the round-5 batch-18 keys: stats_ipw_ate stats_aipw_ate
# plus the round-5 batch-20 keys: eval_cohens_kappa eval_calibration_ece
#   stats_capture_recapture stats_eb_shrinkage
# plus the round-5 batch-21 keys: ml_naive_bayes ml_split_info_gain
#   eval_avg_precision stats_mcnemar
# plus the round-5 batch-22 keys: stats_cramers_v agg_higher_moments
#   privacy_randomized_response stats_friedman
# plus the round-5 batch-23 keys: eval_silhouette graph_hits
#   stats_cohens_d eval_brier_decomposition
# plus the round-5 batch-24 keys: recsys_item_item eval_krippendorff_alpha
#   ts_pacf ts_compound_index
# plus the round-5 batch-25 keys: eval_pass_at_k stats_overdispersion
#   ops_slo_burn stats_bradley_terry
# plus the round-5 batch-26 keys: ts_ohlc_candles stats_runs_test
#   graph_modularity ml_cv_stump
# plus the round-5 batch-27 keys: stats_kruskal_wallis stats_cmh_test
#   eval_youden_threshold stream_ohlc_candles
# plus the round-5 batch-28 keys: eval_isotonic_calibration stats_log_rank
#   ts_max_drawdown eval_confusion_panel
# plus the round-5 batch-29 keys: eval_rouge_n ts_var_cvar
#   ops_littles_law ml_target_encoding
# plus the round-5 batch-30 keys: stats_sprt ml_adaboost
#   ts_bollinger stats_tost
# plus the round-5 batch-31 keys: events_entropy_rate text_kl_matrix
#   eval_rbo stats_tvd_independence
# plus the round-5 batch-32 keys: stats_median_ci text_burstiness
#   stats_simpson_audit eval_fairness_audit
# plus the round-5 batch-33..41 keys (final session):
#   stats_jarque_bera ts_durbin_watson ts_ljung_box stats_g_test
#   stats_sign_test stats_wilcoxon_signed_rank stats_cochran_q
#   eval_fleiss_kappa stats_kendall_w stats_cronbach_alpha stats_icc
#   eval_auc_rank stats_theil_index stats_atkinson_index
#   text_good_turing text_chao1_vocab stats_gumbel_maxima
#   ts_hurst_exponent stats_grubbs_outlier ts_page_hinkley
#   eval_ips_snips eval_bandit_replay recsys_catalog_coverage
#   ops_apdex text_syllable_complexity text_yule_k
#   text_lexical_profile text_rank_turbulence graph_local_clustering
#   graph_reciprocity ts_adf_test ops_erlang_c stats_poisson_two_rate
#   stats_two_prop_z stats_jackknife_se stats_cohens_h
# plus the round-5 batch-42..51 keys (final session, continued):
#   stats_dunn_posthoc stats_nelson_aalen ts_granger_causality
#   stats_reg_discontinuity sketch_kmv_jaccard sketch_bloom_fpr
#   sketch_linear_counting ml_logistic_newton stats_huber_m_estimate
#   stats_cooks_distance ml_ridge_path stats_breusch_pagan
#   embedding_isotropy graph_powerlaw_alpha ts_periodogram
#   eval_mcc_multiclass stream_apdex events_heartbeat_gaps
#   window_rolling_beta attribution_shapley text_source_novelty
#   dedup_length_bias_audit ts_cross_correlation stats_hodges_lehmann
#   embedding_variance_spectrum ml_tree_depth2 ts_halflife
#   graph_rich_club dq_functional_dependency events_time_to_convert
#   stats_qq_deciles agg_trimmed_mean stats_e_process
#   ts_risk_adjusted_returns price_index_fisher stats_yuen_t
#   ts_block_bootstrap stats_fisher_z_test sample_poststratify
#   ml_woe_iv
# plus the round-5 batch-52..56 keys (final session, tail):
#   stats_circular_rayleigh text_keyness_llr ts_turning_points
#   events_dow_hour_profile stats_meta_analysis
#   stats_theil_decomposition events_fano_curve agg_pythagorean_means
#   ml_learning_curve events_burstiness_gb text_topk_coverage
#   ops_mtbf_mttr stats_cochran_armitage stats_tukey_hsd
#   ml_cost_threshold stats_design_effect stats_lorenz_deciles
#   sketch_bbit_minhash recsys_long_tail_share stats_bowley_moors
#   stats_ancova ts_arch_lm stats_split_half_reliability
#   stats_mood_median privacy_unicity ml_kernel_regression
#   events_dau_stickiness text_entropy_ngram_curve text_burrows_delta
#   stats_page_trend stats_weibull_fit text_heaps_law
#   events_attribution_window_sweep ml_majority_vote_ensemble
#   stats_two_by_two_panel text_shingle_size_sweep
#   ops_process_capability stats_benford_second
#   events_return_gap_profile graph_weight_disparity
# plus the round-5 batch-19 keys: stats_mann_kendall stats_delta_method_ratio
#   ts_seasonality_strength privacy_cell_suppression
#   pipeline_curation_funnel stream_quality_census
#   similarity_ndcg_eval stats_conformal_coverage privacy_dp_histogram
#   shard_rendezvous_stability similarity_filtered_search
#   pipeline_curriculum_order sample_weighted_es
#   similarity_rerank_two_stage stats_srm_check stats_power_mde
# plus the round-5 batch-2/3 keys (registered after the window):
#   pipeline_train_val_split dedup_source_matrix text_winnowing
#   sql_identifier_clause ansi_try_funcs graph_components
#   sql_pipe_syntax generator_funcs similarity_pq text_cdc_chunks
#   stats_bootstrap_ci text_feature_hashing stream_stream_full
#   sql_session_variables url_funcs bitwise_funcs stream_late_audit
#   embedding_mrl_eval privacy_k_anonymity tz_funcs stats_theil_sen
#   hash_funcs stream_stateful_timeout sql_group_by_all
#   embedding_hard_negatives stream_checkpoint_resume events_session_pmi
#   stats_wilson_ci dedup_url_canonical


def _front_load(priority: tuple[str, ...]) -> None:
    missing = [k for k in priority if k not in REGISTRY]
    if missing:
        raise RuntimeError(f"priority keys not registered: {missing}")
    ordered = {k: REGISTRY[k] for k in priority}
    ordered.update((k, v) for k, v in REGISTRY.items() if k not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_front_load(_PRIORITY)

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "spark_queries",
    "oracle_sqls",
    "relational",
]
