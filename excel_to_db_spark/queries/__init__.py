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

# The round driver verifies the FIRST 50 registry keys (iteration order);
# everything else only gets the local tools/check.py run. Round-4 window
# (rotated per VERDICT r3 #4): the three keys whose contracts changed
# this round (they need fresh driver rows), then ~47 keys that have
# NEVER had a driver CORRECTNESS row — the remaining 18 TPC-H queries,
# the scalar-function packs, and this round's cents-rule conversions.
# Rounds 2/3 already drove the relational surface, streaming family, and
# LLM-pipeline flagships green; they follow in registration order and
# stay covered by the local gate.
_PRIORITY: tuple[str, ...] = (
    # Changed this round — re-verify under the driver
    "jsonl_roundtrip", "multimodal_features", "dedup_simhash",
    # TPC-H remainder (q1/q3/q9/q18 were driver-green in r3)
    "tpch_q2", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q19", "tpch_q20",
    "tpch_q21", "tpch_q22",
    # Scalar/aggregate function packs (SURVEY §2.B functions rows)
    "str_funcs", "str_funcs2", "math_funcs", "date_funcs", "date_epoch",
    "date_strftime_compat", "case_when", "cast_funcs", "arith_funcs",
    "json_extract", "json_typed", "json_kv_explode", "array_funcs",
    "filter_glob", "agg_groupconcat", "approx_percentile",
    "window_ntile", "window_nth",
    # UDF / UDTF rows
    "udf_scalar", "udtf_chunks", "udtf_lateral",
    # Cents-rule conversions this round with no prior driver row
    "customer_rfm", "embedding_quantize", "stats_chi_square",
    # As-of join variants (join_asof itself was driver-green in r3)
    "join_asof_forward", "join_asof_nearest",
    # Storage-layout round trips
    "orc_roundtrip", "excel_sink_partitioned", "schema_evolution_read",
)


# Round-5 rotation TODO (86 keys with no driver CORRECTNESS row after
# r4; regenerate with: REGISTRY keys - CORRECTNESS_r0{1,2,3} keys -
# r4 _PRIORITY). Put ~50 of these first next round, prioritizing the
# r4-new quality/streaming keys and the relational2/3 + pipeline packs:
#   map_funcs interval_arith regexp_pack set_bag_ops window_ignore_nulls
#   anti_join_nulls join_null_safe relational_division sequence_gaps
#   agg_mode agg_histogram window_exclude window_groups_frame
#   str_fuzzy_match map_in_arrow dedup_minhash_est similarity_recall
#   events_session_dynamic stream_dedup_watermark stream_tumbling_append
#   join_asof_tolerance join_range stream_stream_left events_latest_state
#   events_funnel text_ngram_overlap text_idf embedding_centroids
#   text_repetition sample_stratified text_vocab_mask sample_rebalance
#   docs_length_quantile group_zscore_pandas text_keywords text_pii_scrub
#   text_entropy text_bigram_lm embedding_outliers basket_affinity
#   events_markov ts_interpolate pareto_share group_mad_outliers
#   events_rolling_anomaly events_inter_arrival graph_pagerank3
#   window_ewma agg_decimal_exact mom_growth interval_concurrency
#   window_rolling_median rolling_wau attribution_last_touch
#   stats_welch_t agg_regression events_path3 stats_mannwhitney
#   profile_columns stats_benford snapshot_diff keyset_pagination
#   rank_movement time_rollup agg_reaggregation join_scd2
#   running_distinct_users excel_roundtrip dynamic_partition_overwrite
#   federated_union xml_roundtrip multimodal_binary_ingest
#   text_source_lines variant_json stream_state_inspect
#   json_malformed_handling stream_foreachbatch dq_expectations
#   graph_triangles zorder_layout sample_reservoir decontam_traintest
#   events_pattern hll_mergeable distinct_salted winsorize_group
#   bpe_train_merges bpe_tokenize_corpus graph_bfs_levels agg_corr_matrix
#   stream_topk_trending range_partition_histogram udaf_grouped_pandas
#   stats_cuped window_rolling_corr skyline_pareto_front
#   attribution_position text_sparse_cosine dedup_containment
#   dedup_incremental text_keyword_search stream_scd2_enrich
#   sample_pps_systematic ts_seasonal_decompose embedding_pca_power
#   agg_weighted_median csv_malformed_handling sql_parameterized
#   sql_scripting pandas_on_spark_agg join_dpp_pruned multimodal_phash
#   stream_rocksdb_state window_range_trailing7d join_hint_shuffle_hash
#   sql_declared_udf string_collation_group udtf_arrow
#   group_quantile_normalize stats_kaplan_meier events_changepoint
#   agg_gini stats_ols_multi customer_rfm_scaled price_index_laspeyres
#   ts_autocorrelation supplier_herfindahl text_compression_quality
#   inventory_abc_xyz graph_assortativity ts_forecast_baseline_eval
#   dedup_cluster_eval stats_anova_f text_langid_eval pipeline_data_card
#   stream_update_mode interval_concurrency_timeline


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
