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

import re
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
    check -> temp view (+cache, mirroring the in-memory SQLite db).

    This is the reference-semantics path (fixed positional 5-column
    schema, header names ignored). For arbitrary sheets, the optional
    inference path is :func:`load_excel_table_inferred` — kept separate
    and OFF by default so reference parity stays byte-exact."""
    opts = opts or IngestOptions()
    df = rows_to_dataframe(spark, iter_xlsx_rows(path, sheet), opts)
    df = df.cache()
    if opts.enforce_unique:
        check_unique_key(df)
    df.createOrReplaceTempView(view_name)
    return df


# ---------------------------------------------------------------------------
# Optional schema inference (round 7; OFF by default — the reference's
# loader, src/main.rs:67-75, ignores header names and fixes the schema,
# so inference is a new capability, not a parity behavior).

_IDENT_RE = re.compile(r"[^0-9A-Za-z_]+")


def _sanitize_names(header: list[Any] | None, width: int) -> list[str]:
    """Header cells -> unique Spark-safe column names; positional
    col_N fallbacks for missing/blank/non-string headers."""
    names: list[str] = []
    seen: dict[str, int] = {}
    for i in range(width):
        raw = header[i] if header and i < len(header) else None
        name = _IDENT_RE.sub("_", str(raw).strip()) if raw is not None else ""
        name = name.strip("_") or f"col_{i}"
        if name[0].isdigit():
            name = f"c_{name}"
        n = seen.get(name, 0)
        seen[name] = n + 1
        names.append(name if n == 0 else f"{name}_{n + 1}")
    return names


def _unify_type(acc: str | None, v: Any) -> str | None:
    """Fold one cell into a column's type accumulator. Lattice:
    (none) -> bool | long -> double -> string; any incompatible mix ->
    string. Mirrors spark.read.csv inferSchema's promotion idea, typed
    from the already-decoded Python cells instead of text."""
    if v is None:
        return acc
    if isinstance(v, bool):
        t = "bool"
    elif isinstance(v, int):
        t = "long"
    elif isinstance(v, float):
        t = "double"
    else:
        t = "string"
    if acc is None or acc == t:
        return t
    if {acc, t} == {"long", "double"}:
        return "double"
    return "string"


_SPARK_TYPES = {"bool": "boolean", "long": "bigint",
                "double": "double", "string": "string"}


def infer_excel_schema(rows: list[list[Any]], header: list[Any] | None,
                       sample: int | None = None) -> StructType:
    """Infer a StructType from decoded sheet rows. ``sample`` limits how
    many rows vote (None = all rows — like Spark's CSV inference
    default, so a late type change can't be silently mis-coerced).
    All columns come out nullable: xlsx omits empty cells, so
    non-nullability is never provable from data."""
    from pyspark.sql.types import _parse_datatype_string

    # Width is the max of the widest DATA row and the header: a header
    # wider than every body row (trailing all-empty columns — xlsx omits
    # empty cells) must still contribute its named columns, as
    # all-null strings (ADVICE r7: the old widest-row-only width
    # silently dropped them).
    width = max(max((len(r) for r in rows), default=0),
                len(header or []))
    if width == 0:
        raise ValueError(
            "cannot infer a schema from a sheet with no data rows and "
            "no header row — pass an explicit schema or a sheet with "
            "at least a header")
    accs: list[str | None] = [None] * width
    voting = rows if sample is None else rows[:sample]
    for r in voting:
        for i, v in enumerate(r):
            accs[i] = _unify_type(accs[i], v)
    names = _sanitize_names(header, width)
    fields = ", ".join(
        f"`{n}` {_SPARK_TYPES[a or 'string']}"
        for n, a in zip(names, accs))
    return _parse_datatype_string(fields)


def _coerce_inferred(v: Any, kind: str, mode: str) -> Any:
    """Cell -> inferred column type. PERMISSIVE nulls out stragglers
    beyond the sampled rows (same contract as Spark's CSV PERMISSIVE
    mode); FAILFAST raises."""
    if v is None:
        return None
    ok: Any
    if kind == "boolean":
        ok = v if isinstance(v, bool) else None
    elif kind == "bigint":
        ok = v if isinstance(v, int) and not isinstance(v, bool) else None
    elif kind == "double":
        ok = float(v) if isinstance(v, (int, float)) \
            and not isinstance(v, bool) else None
    else:  # string: everything prints; bools in SQLite's lowercase
        ok = str(v).lower() if isinstance(v, bool) else str(v)
    if ok is None and mode == "FAILFAST":
        raise ValueError(f"cell {v!r} does not fit inferred type {kind}")
    return ok


def load_excel_table_inferred(spark: SparkSession, path: str,
                              sheet: str | None = None,
                              view_name: str = "excel_rows",
                              header: bool = True,
                              sample: int | None = None,
                              mode: str = "PERMISSIVE") -> DataFrame:
    """Schema-INFERRED xlsx ingest (optional path): header row becomes
    column names (sanitized, deduped; positional col_N fallback),
    per-column types unify over ``sample`` rows (None = all) through a
    none->bool|long->double->string lattice, and every row is coerced to
    the result — PERMISSIVE nulls non-conforming stragglers, FAILFAST
    raises. The reference-parity path (fixed 5-column positional
    schema) stays :func:`load_excel_table`; this is for arbitrary
    sheets."""
    rows = list(iter_xlsx_rows(path, sheet))
    head = rows[0] if header and rows else None
    body = rows[1:] if header and rows else rows
    schema = infer_excel_schema(body, head, sample)
    kinds = [f.dataType.simpleString() for f in schema.fields]
    width = len(kinds)
    data = [
        tuple(_coerce_inferred(r[i] if i < len(r) else None, kinds[i], mode)
              for i in range(width))
        for r in body
    ]
    df = spark.createDataFrame(data, schema)
    df.createOrReplaceTempView(view_name)
    return df
