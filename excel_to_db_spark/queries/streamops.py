"""Streaming-twin pack (round 6, batch 74): two monitors whose state
the Structured Streaming engine maintains incrementally over a finite
file-source replay, verified register-/counter-exactly against the
SAME DuckDB oracles as their batch twins (`sketch_hll_manual`,
`ops_partition_skew`). The streaming-vs-batch equality is the
mergeability proof: a grouped MAX is the HLL union, a grouped COUNT
is the census union — both fold per micro-batch without ever holding
rows. See streaming/windows.py:run_stream_hll_registers /
run_stream_skew_monitor for the state-size arguments."""

from __future__ import annotations

from .registry import query
from .flagships2 import _HLL_ORACLE
from .dataops import _SKEW_ORACLE
from .spc import _P_CHART_ORACLE


@query("stream_hll_registers", oracle=_HLL_ORACLE)
def stream_hll_registers(spark, sf_dir):
    """Streaming twin of `sketch_hll_manual`: per-bucket max-rank
    registers updated by the engine on every micro-batch (a live
    sketch union per trigger; state <= 64 scalars at ANY cardinality),
    report arithmetic batch-side on the final complete-mode emission.
    The batch oracle checks every register."""
    from ..streaming.windows import run_stream_hll_registers

    return run_stream_hll_registers(spark, sf_dir)


@query("stream_skew_monitor", oracle=_SKEW_ORACLE)
def stream_skew_monitor(spark, sf_dir):
    """Streaming twin of `ops_partition_skew`: the (month x priority)
    landing-table census maintained incrementally, skew rank
    arithmetic on the final emission. The monitor that flags a hot
    partition key while the table is still loading."""
    from ..streaming.windows import run_stream_skew_monitor

    return run_stream_skew_monitor(spark, sf_dir)


@query("stream_spc_monitor", oracle=_P_CHART_ORACLE)
def stream_spc_monitor(spark, sf_dir):
    """Streaming twin of `spc_p_chart` (round 6, batch 93): the
    per-day (n_items, n_defect) census maintained incrementally by
    the engine over a lineitem replay — the landing-table quality
    monitor that watches defect shares while the load is running.
    Control-limit arithmetic (p-bar, per-day 3-sigma binomial
    bounds) runs batch-side on the final complete-mode emission,
    which for a drained finite replay equals the batch census — the
    batch p-chart oracle checks every day's limits and flags."""
    from ..streaming.windows import run_stream_spc_monitor

    return run_stream_spc_monitor(spark, sf_dir)
