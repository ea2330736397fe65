"""Round-4 plan/property guards: runtime bloom-filter semi-join
reduction (the 100 TB selective-join feature), and the Morton-code
bijection behind zorder_layout."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_runtime_bloom_filter_reduces_probe_side(spark, sf_dir):
    """With a selective filter on one join side and broadcast disabled
    (the 100 TB shuffle-join regime), Catalyst injects a bloom filter
    from the filtered side into the probe side's scan — rows are
    dropped BEFORE the shuffle. Thresholds are lowered to make the tiny
    test data eligible; at production scale the defaults (10 MB
    creation side) trigger on real dimensions."""
    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10GB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter"
                       ".applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_morton16_is_a_bijection():
    """Every (x, y) in the 256x256 key space maps to a distinct Morton
    code in [0, 65536) — required for the z-bucket locality claims."""
    def interleave(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    seen = {interleave(x, y) for x in range(256) for y in range(256)}
    assert len(seen) == 65536
    assert min(seen) == 0 and max(seen) == 65535


def test_morton16_spark_matches_python(spark):
    """The codegen'd _morton16 expression equals the reference Python
    bit-interleave on a sample grid."""
    from excel_to_db_spark.queries.quality import _morton16

    rows = (spark.range(0, 4096)
            .select((F.col("id") % 64 * 4).alias("x"),
                    (F.col("id") / 64).cast("long").alias("y")))
    out = rows.select("x", "y", _morton16(F.col("x"), F.col("y")).alias("z"))

    def interleave(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in out.collect():
        assert r.z == interleave(r.x, r.y)
