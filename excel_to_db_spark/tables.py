"""Loaders for the driver-generated star-schema testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

`events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 cannot map to its
microsecond TimestampType; we read it as a nanosecond long
(spark.sql.legacy.parquet.nanosAsLong) and truncate-convert to a proper
timestamp with integer division (truncation matches DuckDB's ns->us cast,
and the generated data is µs-aligned so it is lossless).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types where parquet and Spark
    disagree. Plain `spark.read.parquet` keeps predicate pushdown, column
    pruning and partition-splitting intact."""
    if name == "events":
        # Runtime-settable; needed when the session was created without it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns -> µs truncation: `div` (integer division) matches DuckDB cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each table as a temp view so `spark.sql` sees the same
    names the DuckDB oracle does."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
