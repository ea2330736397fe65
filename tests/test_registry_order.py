"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round5_rotation():
    """Round-5 window: the keys whose oracles/projections changed this
    round (the r4 type-class hash-fails and the latent instances the
    type-faithful gate flushed out) must get fresh driver rows, and the
    rest of the window draws from the never-driver-sampled pool."""
    head = set(list(REGISTRY)[:50])
    for key in (
        # r4 driver hash-fails, fixed this round
        "jsonl_roundtrip", "tpch_q12", "math_funcs",
        # latent type-class fixes found by the strict local gate
        "group_mad_outliers", "sql_parameterized", "sql_declared_udf",
        "agg_decimal_exact", "stats_anova_f",
        # r4 bench REGRESSION flag
        "basket_affinity",
        # representative never-sampled blocks
        "stats_welch_t", "agg_gini", "window_rolling_median",
        "anti_join_nulls", "xml_roundtrip",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
