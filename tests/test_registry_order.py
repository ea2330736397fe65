"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round6_rotation():
    """Round-6 window: the one key whose oracle changed this round (the
    r5 HUGEINT hash-fail) must get a fresh driver row, and the rest of
    the window draws from the never-driver-sampled pool — streaming
    family, Spark-4 surface, pipeline flagships, join-strategy keys."""
    head = set(list(REGISTRY)[:50])
    for key in (
        # r5 driver hash-fail, oracle fixed this round
        "variant_json",
        # representative never-sampled blocks
        "stream_dedup_watermark", "stream_stream_full",
        "stream_checkpoint_resume", "map_in_arrow", "sql_pipe_syntax",
        "dedup_incremental", "similarity_pq", "embedding_pca_power",
        "shuffle_epoch", "join_skew_salted", "text_gopher_rules",
        "bpe_train_merges", "multimodal_binary_ingest",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
