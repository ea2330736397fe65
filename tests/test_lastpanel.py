"""Semantic guards for the SPC/forensics/retention/disparity batch:
Cp/Cpk vs numpy moments, Benford-2 vs the exact law, return gaps vs a
per-user scan, and disparity vs share algebra."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_process_capability_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.lastpanel import ops_process_capability
    row = ops_process_capability(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    c = np.floor(ev["value"] * 100 + 0.5).astype("int64")\
        .to_numpy(dtype="float64")
    mu, sigma = c.mean(), c.std()
    assert row.n == len(c)
    assert abs(row.cp - (20000 - 100) / (6 * sigma)) < 1e-3
    assert abs(row.cpk - min(20000 - mu, mu - 100) / (3 * sigma)) \
        < 1e-3
    oos = float(((c < 100) | (c > 20000)).mean())
    assert row.observed_oos == _r(oos, 6)
    # Cpk can never exceed Cp (centering only loses margin)
    assert row.cpk <= row.cp + 1e-9


def test_benford_second_exact_law(spark, sf_dir):
    from excel_to_db_spark.queries.lastpanel import stats_benford_second
    row = stats_benford_second(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    cents = cents[cents >= 10]
    d2 = Counter(int(str(v)[1]) for v in cents)
    n = sum(d2.values())
    p = {d: sum(math.log10(1 + 1 / (10 * f + d)) for f in range(1, 10))
         for d in range(10)}
    assert abs(sum(p.values()) - 1.0) < 1e-12
    chi_u = sum(round((d2.get(d, 0) - p[d] * n) ** 2 / (p[d] * n)
                      * 1e8) for d in range(10) if d in d2)
    assert row.n == n
    assert abs(row.chi2_9df - chi_u / 1e8) < 1e-3
    assert row.chi2_9df >= 0


def test_return_gap_user_scan(spark, sf_dir):
    from excel_to_db_spark.queries.lastpanel import (
        events_return_gap_profile)
    row = events_return_gap_profile(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    ev["dayno"] = (ev["ts"].dt.floor("D")
                   - pd.Timestamp("2024-01-01")).dt.days
    gaps = []
    for _, grp in ev.groupby("user_id"):
        days = sorted(set(grp["dayno"]))
        gaps.extend(b - a for a, b in zip(days, days[1:]))
    gaps.sort()
    n = len(gaps)
    assert row.n_gaps == n
    assert row.mean_gap_d == _r(sum(gaps) / n, 4)
    assert row.p50_gap_d == gaps[(n + 1) // 2 - 1]
    assert row.p90_gap_d == gaps[(9 * n + 9) // 10 - 1]
    assert row.p50_gap_d <= row.p90_gap_d


def test_weight_disparity_share_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.lastpanel import graph_weight_disparity
    rows = {r.nation: r
            for r in graph_weight_disparity(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["c_nationkey"] != j["s_nationkey"]]
    j["cents"] = np.floor(j["l_extendedprice"] * 100 + 0.5)\
        .astype("int64")
    w = (j.groupby(["c_nationkey", "s_nationkey"])["cents"].sum()
         .reset_index())
    for u, grp in w.groupby("c_nationkey"):
        strength = int(grp["cents"].sum())
        y_u = sum(round((int(cw) / strength) ** 2 * 1e6)
                  for cw in grp["cents"])
        r = rows[u]
        assert r.out_degree == len(grp)
        assert r.disparity_y == _r(y_u / 1e6, 6)
        assert r.ky == _r(y_u / 1e6 * len(grp), 4)
        # Y is bounded by [1/k, 1]
        assert 1.0 / len(grp) - 1e-6 <= r.disparity_y <= 1.0 + 1e-6
