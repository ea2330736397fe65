"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round10_rotation():
    """Round-10 window (VERDICT r9 #1): stats supermajority (30 slots)
    over the rank/concordance, two-sample-EDF, and matrix/iterative
    pools, plus 12 text distributional contracts and the 8-key ts
    spectral/variance panel. Zero overlap with the r1–r9 windows."""
    head = set(list(REGISTRY)[:50])
    for key in (
        "stats_kendall", "stats_spearman", "stats_kruskal_wallis",
        "stats_ks_two_sample", "stats_ad_two_sample",
        "stats_partial_corr", "stats_bradley_terry", "stats_sprt",
        "stats_weibull_fit", "stats_tukey_hsd",
        "text_bigram_lm", "text_kl_matrix", "text_zipf_fit",
        "text_pii_scrub",
        "ts_hurst_exponent", "ts_periodogram", "ts_var_cvar",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
