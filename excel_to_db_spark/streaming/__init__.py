"""Structured Streaming operators (SURVEY.md §2.C streaming tier).

The reference is strictly single-shot batch (reference src/main.rs:130-177
— one load, one REPL); streaming is a Tier C extension. Design rule:
every streaming aggregation here is the SAME `pyspark.sql.functions`
window expression as its batch twin in `queries/extensions.py`, so the
batch oracle checks the streaming semantics (Spark guarantees the two
paths agree on finite input).
"""

from .stateful import (  # noqa: F401
    run_stateful_max,
    run_stateful_totals,
    stateful_user_max,
    stateful_user_totals,
    transform_with_state_available,
)
from .windows import (  # noqa: F401
    events_stream_reader,
    hopping_agg,
    run_hopping_stream,
    run_session_stream,
    run_stream_dedup,
    run_stream_static_join,
    run_stream_stream_join,
    run_stream_stream_left_join,
    run_stream_dedup_watermark,
    run_stream_topk_trending,
    run_stream_scd2_enrich,
    run_tumbling_stream_rocksdb,
    run_stream_update_mode,
    run_tumbling_stream_multibatch,
    run_tumbling_stream,
    session_agg,
    tumbling_agg,
)
