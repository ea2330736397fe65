"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round7_rotation():
    """Round-7 window (VERDICT r6 #2): rotate over the families with
    zero driver coverage through round 6 — privacy, sketches, geo, and
    ops close completely; the riskiest graph/ml/eval keys fill the
    rest."""
    head = set(list(REGISTRY)[:50])
    for key in (
        # whole-family closures
        "privacy_k_anonymity", "privacy_unicity",
        "sketch_count_min", "sketch_hll_manual",
        "geo_grid_radius_join", "geo_nearest_deciles",
        "ops_slo_burn", "ops_lindley_replay",
        # risk-ranked picks
        "graph_ktruss_peel", "graph_components",
        "ml_logistic_newton", "ml_ransac_line",
        "eval_isotonic_calibration", "eval_krippendorff_alpha",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
