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

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "spark_queries",
    "oracle_sqls",
    "relational",
]
