"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round11_rotation():
    """Round-11 window (VERDICT r10 #1): stats majority (27 slots)
    over the resampling/CI, causal, categorical-association, and
    reliability pools, plus 11 text corpus-census contracts, the
    6-key ts indicator/replay panel, and events/eval fill. Zero
    overlap with the r1–r10 windows."""
    head = set(list(REGISTRY)[:50])
    for key in (
        "stats_fdr_bh", "stats_permutation_test", "stats_bootstrap_ci",
        "stats_ipw_ate", "stats_aipw_ate", "stats_diff_in_diff",
        "stats_mcnemar", "stats_cmh_test", "stats_cramers_v",
        "stats_cronbach_alpha", "stats_eb_shrinkage",
        "text_langid_eval", "text_idf", "text_entropy",
        "text_topk_coverage",
        "ts_ohlc_candles", "ts_bollinger",
        "events_latest_state", "eval_fairness_audit",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
