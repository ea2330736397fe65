"""Excel -> Spark table ingest with the reference's executed semantics.

Reference behavior being reproduced (SURVEY.md §1):

- header row skipped unconditionally (src/main.rs:67)
- columns mapped POSITIONALLY, header names ignored (src/main.rs:69-75)
- fixed 5-column schema: service_name TEXT NOT NULL, three REAL, one
  INTEGER (DDL at src/main.rs:182-188)
- missing / non-float numeric cell -> 0.0, non-int count -> 0
  (unwrap_or defaults, src/main.rs:71-75); a null-preserving mode is
  offered as an option (the reference's dead serde path,
  src/main.rs:37-47, would have done this)
- service_name must be unique (intended unique index,
  src/main.rs:189-190); enforced here as a load-time aggregate check
  since Spark has no index/constraint system
- reference PANICS on a short row or non-string first cell
  (src/main.rs:69-75); we default to PERMISSIVE (per-row repair) with a
  FAILFAST option, mirroring Spark reader mode semantics
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from .sources.xlsx import iter_xlsx_rows

EXCEL_ROWS_SCHEMA = StructType([
    StructField("service_name", StringType(), False),
    StructField("average_response_time_95_ms", DoubleType(), False),
    StructField("count", LongType(), False),
    StructField("max_response_time_95_ms", DoubleType(), False),
    StructField("min_response_time_95_ms", DoubleType(), False),
])

# Null-preserving variant (optional mode): numeric columns nullable.
EXCEL_ROWS_SCHEMA_NULLABLE = StructType([
    StructField("service_name", StringType(), False),
    StructField("average_response_time_95_ms", DoubleType(), True),
    StructField("count", LongType(), True),
    StructField("max_response_time_95_ms", DoubleType(), True),
    StructField("min_response_time_95_ms", DoubleType(), True),
])


class DuplicateKeyError(ValueError):
    """Raised when service_name uniqueness (the reference's intended
    unique index) is violated at load time."""


@dataclass
class IngestOptions:
    mode: str = "PERMISSIVE"          # or "FAILFAST" (reference panics)
    null_preserving: bool = False     # True = serde-path semantics (NULLs)
    enforce_unique: bool = True
    skip_header: bool = True


def _coerce_f64(v: Any) -> float | None:
    """calamine get_float semantics: numeric cells only."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    return None


def _coerce_i64(v: Any) -> int | None:
    """calamine as_i64: int, any finite float (TRUNCATED, 2.7 -> 2 —
    matching calamine's Float-as-i64 cast), or numeric string."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v) if v == v and abs(v) != float("inf") else None
    if isinstance(v, str):
        try:
            return int(v.strip())
        except ValueError:
            return None
    return None


def coerce_row(cells: list[Any], opts: IngestOptions) -> tuple | None:
    """One sheet row -> one typed excel_rows tuple (or None to drop)."""
    padded = list(cells) + [None] * (5 - len(cells)) if len(cells) < 5 else cells
    name = padded[0]
    if not isinstance(name, str):
        if opts.mode == "FAILFAST":
            raise ValueError(f"non-string service_name cell: {name!r}")
        if name is None:
            return None  # permissive: unkeyable row dropped
        name = str(name)
    if opts.mode == "FAILFAST" and len(cells) < 5:
        raise ValueError(f"short row ({len(cells)} cells): {cells!r}")
    avg = _coerce_f64(padded[1])
    cnt = _coerce_i64(padded[2])
    mx = _coerce_f64(padded[3])
    mn = _coerce_f64(padded[4])
    if not opts.null_preserving:
        avg = 0.0 if avg is None else avg
        cnt = 0 if cnt is None else cnt
        mx = 0.0 if mx is None else mx
        mn = 0.0 if mn is None else mn
    return (name, avg, cnt, mx, mn)


def rows_to_dataframe(spark: SparkSession, sheet_rows: Iterable[list[Any]],
                      opts: IngestOptions | None = None) -> DataFrame:
    opts = opts or IngestOptions()
    it = iter(sheet_rows)
    if opts.skip_header:
        next(it, None)
    data = [r for r in (coerce_row(row, opts) for row in it) if r is not None]
    schema = EXCEL_ROWS_SCHEMA_NULLABLE if opts.null_preserving else EXCEL_ROWS_SCHEMA
    # Arrow-batched driver->JVM transfer; the distributed analogue of the
    # reference's FFI hop into SQLite. For sheets too big for the driver,
    # use sources.datasource.XlsxDataSource (partitioned reads) or stage
    # to parquet first.
    return spark.createDataFrame(data, schema)


def check_unique_key(df: DataFrame, key: str = "service_name") -> None:
    dupes = (df.groupBy(key).count().filter(F.col("count") > 1).limit(20).collect())
    if dupes:
        raise DuplicateKeyError(
            f"duplicate {key} values at load: {[r[0] for r in dupes]}")


def load_excel_table(spark: SparkSession, path: str, sheet: str | None = None,
                     view_name: str = "excel_rows",
                     opts: IngestOptions | None = None) -> DataFrame:
    """Full ingest pipeline: parse -> coerce -> DataFrame -> uniqueness
    check -> temp view (+cache, mirroring the in-memory SQLite db)."""
    opts = opts or IngestOptions()
    df = rows_to_dataframe(spark, iter_xlsx_rows(path, sheet), opts)
    df = df.cache()
    if opts.enforce_unique:
        check_unique_key(df)
    df.createOrReplaceTempView(view_name)
    return df
