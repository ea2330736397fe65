"""Cross-engine-exact float aggregation (the SURVEY §4.3 rule, one
definition for the whole tree).

A `sum` of doubles depends on partial-aggregation order, so a rounded
money/stat result can flip between Spark's parallel accumulation and an
oracle's sequential one (observed: half-cent boundary flakes,
CORRECTNESS r3 `jsonl_roundtrip`). The fix is structural: accumulate in
integer fixed-point units (BIGINT — associative, order-free), divide
and round ONCE at the end. Oracle twin for the default cents scale:

    round(sum(CAST(round(x * 100) AS BIGINT)) / 100.0, 2)

Window RUNNING sums are exempt (their frame order is pinned by ORDER
BY, so plain doubles are already deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed_sum(col: Column, scale: float = 100.0, digits: int = 2) -> Column:
    """sum(col) accumulated in integer `scale`ths, rounded to `digits`.
    `scale` must make round(col * scale) fit in BIGINT for the corpus
    (cents: 100; stat residuals: up to 1e9)."""
    return F.round(F.sum(F.round(col * scale).cast("bigint")) / scale,
                   digits)


def cents_sum(col: Column) -> Column:
    """The 2dp money default: sum in integer cents."""
    return fixed_sum(col, 100.0, 2)


def h32(col: Column) -> Column:
    """First 32 bits of md5(col) as a non-negative BIGINT — the
    engine-portable uniform hash the governance/selection keys share.
    Oracle twin (DuckDB):

        CAST(('0x' || substr(md5(x), 1, 8))::UBIGINT AS BIGINT)

    One definition for the whole tree: the Spark conv(...,16,10) and
    the DuckDB UBIGINT parse MUST stay in lockstep or every key built
    on this hash silently diverges cross-engine."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
            .cast("bigint"))
