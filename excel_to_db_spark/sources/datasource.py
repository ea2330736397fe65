"""`spark.read.format("xlsx")` — a Python Data Source (Spark >= 4.0) for
partitioned Excel ingestion.

The reference parses one sheet single-threaded in the driver process
(reference src/main.rs:49-85). The v1 rebuild path (ingest.load_excel_table)
keeps that driver-side shape; this DataSource is the scale path: each
(file, sheet) pair becomes an input partition, so a directory of
workbooks (the realistic "100 GB of Excel" situation — xlsx files are
individually small, there are just many of them) parses in parallel on
executors, feeding Arrow batches straight into the plan. For a single
giant sheet, pre-convert to Parquet (xlsx XML is inherently sequential —
a row-range split would still decompress the whole stream per split).

Usage:

    from excel_to_db_spark.sources.datasource import XlsxDataSource
    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("xlsx")
          .option("path", "/data/books/*.xlsx")   # file, glob, or dir
          .option("sheet", "Sheet1")              # optional: one sheet
          .load())

Schema: the reference's fixed 5-column excel_rows schema with its
executed coercion semantics (ingest.coerce_row defaults mode), or
`.option("null_preserving", "true")` for the serde-path NULL semantics.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..ingest import EXCEL_ROWS_SCHEMA, EXCEL_ROWS_SCHEMA_NULLABLE, IngestOptions


class SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: str):
        self.path = path
        self.sheet = sheet


def _expand_paths(path_opt: str) -> list[str]:
    if os.path.isdir(path_opt):
        return sorted(_glob.glob(os.path.join(path_opt, "*.xlsx")))
    hits = sorted(_glob.glob(path_opt))
    return hits or [path_opt]


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("xlsx datasource requires .option('path', ...)")
        self.sheet = options.get("sheet")  # None => every sheet
        self.opts = IngestOptions(
            mode=options.get("mode", "PERMISSIVE").upper(),
            null_preserving=str(options.get("null_preserving", "false")).lower()
            == "true",
            enforce_unique=False,  # cross-partition constraint; check post-load
        )

    def partitions(self) -> list[SheetPartition]:
        # One partition per (file, sheet): the unit our sequential XML
        # parser can process independently. Listing sheets is a cheap
        # zip-central-directory read, done once on the driver.
        from .xlsx import sheet_names

        parts: list[SheetPartition] = []
        for p in _expand_paths(self.path):
            sheets = [self.sheet] if self.sheet else sheet_names(p)
            parts.extend(SheetPartition(p, s) for s in sheets)
        return parts

    def read(self, partition: SheetPartition):
        # Runs on executors: stream-parse one sheet, yield typed tuples.
        from ..ingest import coerce_row
        from .xlsx import iter_xlsx_rows

        rows = iter_xlsx_rows(partition.path, partition.sheet)
        next(rows, None)  # header skipped unconditionally (src/main.rs:67)
        for cells in rows:
            out = coerce_row(list(cells), self.opts)
            if out is not None:
                yield out


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        if str(self.options.get("null_preserving", "false")).lower() == "true":
            return EXCEL_ROWS_SCHEMA_NULLABLE
        return EXCEL_ROWS_SCHEMA

    def reader(self, schema) -> XlsxReader:
        return XlsxReader(dict(self.options))
