"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_flagship_families():
    head = set(list(REGISTRY)[:50])
    for key in (
        # Tier A parity
        "excel_scan", "load_rowcount", "display_format", "csv_export",
        # streaming (incl. the custom Python source/sink pair)
        "stream_tumbling", "stream_session", "stream_hopping",
        "stream_dedup", "stream_join_static", "stream_stateful",
        "stream_stream_join", "stream_python_source", "stream_custom_sink",
        # LLM-pipeline flagships
        "dedup_minhash", "similarity_ann", "similarity_ivf",
        "pipeline_training_data", "kmeans_lloyd",
        # storage layout
        "join_bucketed",
        # TPC-H sample
        "tpch_q1", "tpch_q3", "tpch_q9", "tpch_q18",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
