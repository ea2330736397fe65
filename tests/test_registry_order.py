"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round4_rotation():
    """Round-4 window: keys whose contracts changed this round plus
    never-driver-checked keys (TPC-H remainder, function packs). The
    r2/r3 flagships already hold driver-green rows and rotate out."""
    head = set(list(REGISTRY)[:50])
    for key in (
        # changed this round -> need fresh driver rows
        "jsonl_roundtrip", "multimodal_features", "dedup_simhash",
        "tpch_q11", "customer_rfm", "embedding_quantize",
        "stats_chi_square",
        # TPC-H remainder (never driver-checked before round 4)
        "tpch_q2", "tpch_q6", "tpch_q17", "tpch_q22",
        # function packs
        "str_funcs", "math_funcs", "date_funcs", "json_extract",
        "udf_scalar", "udtf_chunks",
        # as-of variants + storage round trips
        "join_asof_forward", "join_asof_nearest", "orc_roundtrip",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
