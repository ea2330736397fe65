"""Structured Streaming: the streaming result equals the batch result."""

from __future__ import annotations

from excel_to_db_spark.streaming import run_tumbling_stream, tumbling_agg
from excel_to_db_spark.tables import load_table


def _as_set(df):
    return {(r.win_start, r.win_end, r.n_events, r.sum_value)
            for r in df.collect()}


def test_stream_equals_batch(spark, sf_dir):
    batch = tumbling_agg(load_table(spark, sf_dir, "events"))
    stream = run_tumbling_stream(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)
    assert stream.count() > 0


def test_transform_with_state_user_max(spark, sf_dir):
    """transformWithState (Spark 4 stateful API): per-user count + max
    equals the batch GROUP BY on single-batch replay. Skipped where the
    protobuf runtime the state server needs is unavailable."""
    import pytest

    from excel_to_db_spark.streaming.stateful import (
        run_stateful_max, transform_with_state_available)

    if not transform_with_state_available():
        pytest.skip("protobuf runtime unavailable: transformWithState "
                    "state server cannot start in this environment")
    from pyspark.sql import functions as F

    out = run_stateful_max(spark, sf_dir)
    batch = (load_table(spark, sf_dir, "events")
             .groupBy("user_id")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.max("value"), 2).alias("max_value")))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))
