"""Semantic guards for the rates/jackknife batch: Poisson rate ratio
vs direct counts, two-proportion z vs pandas conversion algebra,
jackknife SE vs an explicit leave-one-out loop, and Cohen's h."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _conv(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["d"] = ev["ts"].dt.floor("D")
    g = (ev.assign(p=(ev["event_type"] == "purchase").astype(int))
         .groupby(["user_id", "d"])["p"].max().reset_index())
    g["seg"] = g["user_id"] % 2
    n1 = int((g["seg"] == 0).sum())
    x1 = int(g.loc[g["seg"] == 0, "p"].sum())
    n2 = int((g["seg"] == 1).sum())
    x2 = int(g.loc[g["seg"] == 1, "p"].sum())
    return n1, x1, n2, x2


def test_poisson_two_rate_direct(spark, sf_dir):
    from excel_to_db_spark.queries.rates import stats_poisson_two_rate
    row = stats_poisson_two_rate(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    c1 = int((ev["event_type"] == "click").sum())
    c2 = int((ev["event_type"] == "purchase").sum())
    assert (row.c1, row.c2) == (c1, c2)
    assert row.rate_ratio == _r(c1 / c2, 6)
    se = math.sqrt(1.0 / c1 + 1.0 / c2)
    assert row.z == _r(math.log(c1 / c2) / se, 5)
    assert abs(row.rr_lo - math.exp(math.log(c1 / c2) - 1.96 * se)) \
        < 1e-5
    assert row.rr_lo < row.rate_ratio < row.rr_hi
    assert 0.0 <= row.p_value <= 1.0


def test_two_prop_z_pandas_conversion(spark, sf_dir):
    from excel_to_db_spark.queries.rates import stats_two_prop_z
    row = stats_two_prop_z(spark, sf_dir).collect()[0]
    n1, x1, n2, x2 = _conv(sf_dir)
    assert (row.n1, row.n2) == (n1, n2)
    p1, p2 = _r(x1 / n1, 8), _r(x2 / n2, 8)
    assert (row.p1, row.p2) == (p1, p2)
    pp = (x1 + x2) / (n1 + n2)
    z = (x1 / n1 - x2 / n2) / math.sqrt(
        pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    assert row.z == _r(z, 5)
    assert row.diff_lo <= p1 - p2 + 1e-9
    assert row.diff_hi >= p1 - p2 - 1e-9
    assert 0.0 <= row.p_value <= 1.0


def test_jackknife_explicit_loop(spark, sf_dir):
    from excel_to_db_spark.queries.rates import stats_jackknife_se
    row = stats_jackknife_se(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype("int64")
    grp = j.groupby("c_nationkey").agg(s=("cents", "sum"),
                                       n=("cents", "size"))
    S, C, g = int(grp["s"].sum()), int(grp["n"].sum()), len(grp)
    thetas = [round((S - s) / (C - n) * 1e6) / 1e6
              for s, n in zip(grp["s"], grp["n"])]
    tbar = sum(thetas) / g
    se = math.sqrt((g - 1) / g * sum((t - tbar) ** 2 for t in thetas))
    assert row.n_groups == g
    assert row.theta == _r(S / C / 100.0, 4)
    assert abs(row.jackknife_se - se / 100.0) < 1e-4
    assert row.jackknife_se > 0


def test_cohens_h_arcsine(spark, sf_dir):
    from excel_to_db_spark.queries.rates import stats_cohens_h
    row = stats_cohens_h(spark, sf_dir).collect()[0]
    n1, x1, n2, x2 = _conv(sf_dir)
    p1, p2 = _r(x1 / n1, 8), _r(x2 / n2, 8)
    h = 2.0 * math.asin(math.sqrt(p1)) - 2.0 * math.asin(math.sqrt(p2))
    assert (row.p1, row.p2) == (p1, p2)
    assert row.cohens_h == _r(h, 6)
    expected = ("negligible" if abs(row.cohens_h) < 0.2 else
                "small" if abs(row.cohens_h) < 0.5 else
                "medium" if abs(row.cohens_h) < 0.8 else "large")
    assert row.magnitude == expected
