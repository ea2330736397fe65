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
