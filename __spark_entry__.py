"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in :mod:`excel_to_db_spark.queries`; this module only
adapts the registry to the driver's function signatures and applies the
session behavior confs (UTC timezone, AQE, Arrow) that the oracle
comparison depends on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_SF_SMOKE = "/root/testdata/sf0.001"


def _tune(spark: SparkSession) -> SparkSession:
    from excel_to_db_spark.session import tune_session

    return tune_session(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary, SURVEY.md §2.B
    `agg_groupby`) on /root/testdata/sf0.001; driver checks rows>0."""
    from excel_to_db_spark.queries import REGISTRY

    _tune(spark)
    return REGISTRY["agg_groupby"].fn(spark, _SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    excel_to_db_spark/queries/*). Each callable takes (spark, sf_dir)."""
    from excel_to_db_spark.queries import REGISTRY

    def _wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: _wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible key in ``queries()``; keys
    without an oracle get the driver's weaker rows-only check."""
    from excel_to_db_spark.queries import oracle_sqls

    return oracle_sqls()
