"""Semantic guards for the round-4 statistics operators — the oracle
gate proves Spark == DuckDB; these prove both mean what the statistic
says: Gini hits its closed-form endpoints, Kaplan-Meier is a proper
decreasing survival curve, CUSUM finds a planted step, and quantile
normalization makes group distributions identical."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gini_endpoints(spark):
    from excel_to_db_spark.queries.stats_tests import agg_gini

    # Uniform values -> G = 0 exactly (rank formula telescopes).
    import tempfile

    d = tempfile.mkdtemp(prefix="e2db_gini_")
    spark.range(100).select(
        F.lit(250.0).alias("o_totalprice")).write.mode("overwrite") \
        .parquet(f"{d}/orders.parquet")
    g0 = agg_gini(spark, d).collect()[0]
    assert g0["gini"] == 0.0 and g0["n"] == 100
    # One order owns everything -> G -> (n-1)/n.
    spark.range(100).select(
        F.when(F.col("id") == 0, 10000.0).otherwise(0.0)
        .alias("o_totalprice")).write.mode("overwrite") \
        .parquet(f"{d}/orders.parquet")
    g1 = agg_gini(spark, d).collect()[0]
    assert abs(g1["gini"] - 0.99) < 1e-9


def test_kaplan_meier_is_decreasing_survival(spark, sf_dir):
    from excel_to_db_spark.queries.stats_tests import stats_kaplan_meier

    rows = stats_kaplan_meier(spark, sf_dir).orderBy("t").collect()
    assert rows, "curve must be non-empty"
    last = 1.0
    for r in rows:
        assert 0.0 < r["survival"] <= last + 1e-9
        assert r["n_events"] <= r["n_at_risk"]
        last = r["survival"]


def test_cusum_finds_planted_step(spark):
    from excel_to_db_spark.queries.stats_tests import events_changepoint

    import tempfile

    d = tempfile.mkdtemp(prefix="e2db_cusum_")
    # 40 days at 10 events/day then 40 days at 30/day: the CUSUM argmax
    # must be the last low-rate day.
    ev = spark.sql("""
        SELECT CAST(id AS BIGINT) AS event_id,
               timestampadd(DAY, CAST(id DIV 1000 AS INT),
                            TIMESTAMP '2024-01-01')
                   AS ts
        FROM range(0, 80000)
        WHERE id % 1000 < CASE WHEN id DIV 1000 < 40 THEN 10 ELSE 30 END
    """)
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = events_changepoint(spark, d).collect()[0]
    assert str(r["changepoint_day"]).startswith("2024-02-09")  # day 39
    assert abs(r["mean_before"] - 10.0) < 1e-9
    assert abs(r["mean_after"] - 30.0) < 1e-9


def test_quantile_normalize_equalizes_groups(spark, sf_dir):
    """After normalization every group's decile means must coincide
    (they all read from the same pooled distribution)."""
    from excel_to_db_spark.queries.stats_tests import (
        group_quantile_normalize,
    )

    rows = group_quantile_normalize(spark, sf_dir).collect()
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r["decile"], []).append(r["mean_normalized"])
    assert len(by_decile) >= 8
    for dec, means in by_decile.items():
        lo, hi = min(means), max(means)
        # Groups differ in size, so their decile boundaries differ by a
        # few pooled ranks — means must agree within a tight band.
        assert hi - lo <= 0.05 * max(abs(hi), 1.0), (dec, means)


def test_distributed_rank_matches_naive_window(spark, sf_dir):
    """The bucketed distributed rank must reproduce the naive
    single-partition row_number bit-for-bit (same value+tiebreak
    order)."""
    from pyspark.sql.window import Window as W

    from excel_to_db_spark.operators.ranking import distributed_rank

    t = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select("o_orderkey",
                 F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents")))
    naive = {(r.o_orderkey, r.rr) for r in t.select(
        "o_orderkey",
        F.row_number().over(W.orderBy("cents", "o_orderkey"))
        .cast("bigint").alias("rr")).collect()}
    dist = {(r.o_orderkey, r.rr) for r in
            distributed_rank(t, "cents", "o_orderkey", "rr").collect()}
    assert dist == naive and dist


def test_distributed_prefix_sum_matches_naive(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from excel_to_db_spark.operators.ranking import distributed_prefix_sum

    vals = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy(F.round(F.col("o_totalprice") * 100).cast("bigint")
                     .alias("v"))
            .agg(F.count("*").alias("c")))
    wn = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    naive = {(r.v, r.p) for r in vals.select(
        "v", F.coalesce(F.sum("c").over(wn), F.lit(0)).alias("p"))
        .collect()}
    dist = {(r.v, r.before) for r in
            distributed_prefix_sum(vals, "v", "c", "before").collect()}
    assert dist == naive and dist


def test_distributed_rank_with_nulls_matches_naive(spark):
    """ADVICE r4: NULL values must not be dropped — they rank FIRST
    (Spark's ascending nulls-first default), same as the naive window."""
    from pyspark.sql.window import Window as W

    from excel_to_db_spark.operators.ranking import distributed_rank

    t = spark.range(500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise((F.col("id") * 37) % 113).alias("v"))
    naive = {(r.k, r.rr) for r in t.select(
        "k", F.row_number().over(W.orderBy("v", "k"))
        .cast("bigint").alias("rr")).collect()}
    dist = {(r.k, r.rr) for r in
            distributed_rank(t, "v", "k", "rr").collect()}
    assert dist == naive and len(dist) == 500


def test_distributed_prefix_sum_with_null_key_matches_naive(spark):
    """A NULL order key sorts first and its row still appears with an
    exclusive prefix of 0, exactly like the naive nulls-first window."""
    from pyspark.sql.window import Window as W

    from excel_to_db_spark.operators.ranking import distributed_prefix_sum

    vals = spark.range(200).select(
        F.when(F.col("id") == 13, None).otherwise(F.col("id")).alias("v"),
        (F.col("id") % 9 + 1).alias("c"))
    wn = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    naive = {(r.v, r.p) for r in vals.select(
        "v", F.coalesce(F.sum("c").over(wn), F.lit(0)).alias("p"))
        .collect()}
    dist = {(r.v, r.before) for r in
            distributed_prefix_sum(vals, "v", "c", "before").collect()}
    assert dist == naive and len(dist) == 200


def test_spearman_matches_pandas(spark, sf_dir):
    """stats_spearman == pandas .corr(method='spearman') (which also
    uses tie-averaged midranks) on the sf0.001 corpus, to 6 dp."""
    import pandas as pd

    from excel_to_db_spark.queries.stats_tests import stats_spearman

    row = stats_spearman(spark, sf_dir).collect()[0]
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_quantity", "l_extendedprice"])
    import numpy as np

    x = pdf["l_quantity"].round().astype("int64")
    y = (pdf["l_extendedprice"] * 100).round().astype("int64")
    # pandas' method="spearman" delegates to scipy (absent here):
    # midrank + Pearson is the same definition.
    rx = x.rank(method="average").to_numpy()
    ry = y.rank(method="average").to_numpy()
    expect = float(np.corrcoef(rx, ry)[0, 1])
    assert row["n"] == len(pdf)
    assert abs(row["rho_spearman"] - round(expect, 6)) <= 1e-6


def test_spearman_perfect_monotone_is_one(spark):
    """A strictly increasing pair gives rho exactly 1 (rank identity)."""
    import tempfile

    from excel_to_db_spark.queries.stats_tests import stats_spearman

    d = tempfile.mkdtemp(prefix="e2db_spear_")
    spark.range(1, 201).select(
        F.col("id").cast("double").alias("l_quantity"),
        (F.col("id") * F.col("id")).cast("double")
        .alias("l_extendedprice")).write.mode("overwrite") \
        .parquet(f"{d}/lineitem.parquet")
    r = stats_spearman(spark, d).collect()[0]
    assert r["rho_spearman"] == 1.0 and r["n"] == 200
