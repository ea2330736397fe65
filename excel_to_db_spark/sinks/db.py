"""Database sinks — the "to_db" of excel_to_db.

The reference's sink is an in-process SQLite database built with a
per-row prepared-INSERT loop (reference src/main.rs:87-128, one
autocommit per row — the classic slow path). Two sinks here:

- `write_sqlite`: single-node parity with the reference (its DB is
  in-process anyway). Streams `toLocalIterator` partition batches into
  executemany inside ONE transaction — the driver never materializes
  the full table, and the transaction batching alone is orders of
  magnitude faster than the reference's per-row autocommit.
- `write_jdbc`: the cluster path — executors write partitions in
  parallel through `df.write.jdbc` (requires the target's JDBC driver
  jar on the classpath; not bundled in this environment, so the call is
  a thin documented wrapper).
"""

from __future__ import annotations

import sqlite3
from typing import Iterable

from pyspark.sql import DataFrame

_SQLITE_TYPES = {
    "string": "TEXT",
    "double": "REAL",
    "float": "REAL",
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "boolean": "INTEGER",
    "binary": "BLOB",
}


def _sqlite_type(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return "REAL"  # numeric affinity; values bind as float
    return _SQLITE_TYPES.get(spark_type, "TEXT")  # dates/timestamps -> TEXT


def _to_sqlite_value(v):
    import datetime
    import decimal

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, datetime.time):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        # sqlite3 refuses to bind Decimal; REAL is its numeric storage
        # class, so the float image is what the column would hold anyway.
        return float(v)
    if isinstance(v, (list, dict)):
        return str(v)
    return v


def write_sqlite(df: DataFrame, path: str, table: str = "excel_rows", *,
                 mode: str = "overwrite", unique_key: str | None = None,
                 batch_size: int = 10_000) -> int:
    """Write a DataFrame into a SQLite database file; returns row count.

    `unique_key` re-creates the reference's intended unique index
    (reference src/main.rs:189-190 — which its own multi-statement
    execute likely never created; see SURVEY.md §1.1). SQLite enforces
    it during the load exactly as the reference intended."""
    cols = df.columns
    decls = ", ".join(f'"{c}" {_sqlite_type(t)}' for c, t in df.dtypes)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        if mode == "overwrite":
            cur.execute(f'DROP TABLE IF EXISTS "{table}"')
        cur.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({decls})')
        if unique_key:
            cur.execute(f'CREATE UNIQUE INDEX IF NOT EXISTS '
                        f'"idx_{table}_{unique_key}" ON "{table}" ("{unique_key}")')
        placeholders = ", ".join("?" for _ in cols)
        ins = f'INSERT INTO "{table}" VALUES ({placeholders})'
        n = 0
        batch: list[tuple] = []
        # toLocalIterator: one partition in driver memory at a time —
        # bounded memory however big the table is.
        for row in df.toLocalIterator():
            batch.append(tuple(_to_sqlite_value(v) for v in row))
            if len(batch) >= batch_size:
                cur.executemany(ins, batch)
                n += len(batch)
                batch.clear()
        if batch:
            cur.executemany(ins, batch)
            n += len(batch)
        con.commit()
        return n
    finally:
        con.close()


def write_jdbc(df: DataFrame, url: str, table: str,
               properties: dict | None = None, mode: str = "overwrite",
               num_partitions: int | None = None) -> None:
    """Cluster-parallel DB write: each executor partition opens its own
    connection and writes its slice (`numPartitions` caps concurrent
    connections). Requires the target database's JDBC driver jar."""
    out = df.repartition(num_partitions) if num_partitions else df
    out.write.jdbc(url, table, mode=mode, properties=properties or {})
