"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round9_rotation():
    """Round-9 window (VERDICT r8 #1): rotate onto the never-sampled
    pools — eval agreement/rank contracts and graph fixpoints first,
    then events sequences, ts lag-window panels, the r8
    repartition-touched ml keys, rolling-hash text, and iterative
    stats closed forms. Zero overlap with the r2–r8 windows."""
    head = set(list(REGISTRY)[:50])
    for key in (
        "eval_cohens_kappa", "eval_rbo", "eval_bleu_counts",
        "graph_pagerank3", "graph_sssp_bellman", "graph_conductance",
        "events_session_dynamic", "events_changepoint",
        "ts_pacf", "ts_granger_causality",
        "ml_knn_classify", "ml_lof_grid",
        "text_winnowing", "text_bm25_search",
        "stats_huber_m_estimate", "stats_pca2_exact",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
