"""Shared fixtures: one local SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    import tempfile

    s = (SparkSession.builder.master("local[4]")
         .appName("excel_to_db_spark-tests")
         .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="e2db_wh_"))
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         # The full suite shares this one JVM for 650+ tests; the
         # default 1g heap OOMs once enough localCheckpoint blocks
         # accumulate (r10: java.lang.OutOfMemoryError in
         # test_graphlp mid-suite, same failure class run_at_sf's
         # _release_blocks docstring records for the sf1 sweeps).
         .config("spark.driver.memory", "6g")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def _release_spark_blocks(request):
    """Deterministically free cached tables and localCheckpoint RDD
    blocks after every test that touched the shared session — the
    ContextCleaner's async sweep falls behind a 650-test run and the
    heap fills with unreachable-but-unreleased blocks (the exact
    failure mode tools/run_at_sf.py:_release_blocks documents for the
    single-JVM sf1 sweeps).

    INVARIANT this sweep imposes (ADVICE r10): no module- or
    session-scoped cache may hold a DataFrame across tests. The
    unpersist covers localCheckpoint blocks, whose LINEAGE IS
    TRUNCATED — a checkpointed frame retained by one test and reused
    by a later one would fail unrecoverably once its blocks are
    freed here. Today's per-query caches (_LOF_N_CACHE,
    geo2._NEAREST_CACHE, ...) hold only ints; keep it that way, or
    scope any future DataFrame cache to a single test."""
    yield
    if "spark" in request.fixturenames:
        s = request.getfixturevalue("spark")
        try:
            s.catalog.clearCache()
            jmap = s.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jmap.values():
                jrdd.unpersist(False)
        except Exception:
            pass


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
