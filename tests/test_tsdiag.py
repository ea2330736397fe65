"""Semantic guards for the ts-diagnostics batch: Jarque-Bera moments
vs an exact-int numpy replay, Durbin-Watson vs the direct residual
formula, Ljung-Box vs statsmodels-free autocorrelation algebra, and
the G-test vs a Counter-based contingency replay."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _daily_cents(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    return (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
            .groupby("d")["c"].sum().sort_index().to_numpy())


def test_jarque_bera_moments_exact_replay(spark, sf_dir):
    from excel_to_db_spark.queries.tsdiag import stats_jarque_bera
    row = stats_jarque_bera(spark, sf_dir).collect()[0]
    x = np.floor(pd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_totalprice"])
                 ["o_totalprice"].to_numpy() + 0.5).astype("int64")
    n = len(x)
    a = int(x.sum()) // n                     # the integer pivot
    d = [int(v) - a for v in x]               # exact Python ints
    sd, d2 = sum(d), sum(v * v for v in d)
    d3, d4 = sum(v ** 3 for v in d), sum(v ** 4 for v in d)
    mu = sd / n
    m2 = d2 / n - mu * mu
    m3 = d3 / n - (3.0 * mu) * (d2 / n) + (2.0 * mu) * (mu * mu)
    m4 = (d4 / n - (4.0 * mu) * (d3 / n)
          + (6.0 * (mu * mu)) * (d2 / n) - 3.0 * ((mu * mu) * (mu * mu)))
    assert row.n == n
    assert row.skewness == _r(m3 / (m2 * math.sqrt(m2)), 6)
    assert row.kurtosis == _r(m4 / (m2 * m2), 6)
    # cross-check the shift algebra against direct central moments
    assert abs(m2 - np.var(x)) < 1e-6 * abs(m2)


def test_durbin_watson_direct_residual_formula(spark, sf_dir):
    from excel_to_db_spark.queries.tsdiag import ts_durbin_watson
    row = ts_durbin_watson(spark, sf_dir).collect()[0]
    x = _daily_cents(sf_dir).astype("float64")
    e = x - x.mean()
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e * e))
    assert row.n == len(x)
    assert abs(row.dw - dw) < 1e-4          # replay is float, key is exact
    assert row.rho1_approx == _r(1.0 - row.dw / 2.0, 5)
    assert 0.0 < row.dw < 4.0               # DW's hard range


def test_ljung_box_autocorrelation_replay(spark, sf_dir):
    from excel_to_db_spark.queries.tsdiag import ts_ljung_box
    row = ts_ljung_box(spark, sf_dir).collect()[0]
    x = _daily_cents(sf_dir).astype("float64")
    n = len(x)
    mu = x.mean()
    e = x - mu
    g0 = float(np.sum(e * e))
    q = 0.0
    rho1 = None
    for k in range(1, 7):
        gk = float(np.sum(e[:-k] * e[k:]))
        rho = gk / g0
        if k == 1:
            rho1 = rho
        q += rho * rho / (n - k)
    q *= n * (n + 2.0)
    assert (row.n, row.df) == (n, 6)
    assert abs(row.rho1 - rho1) < 1e-4
    assert abs(row.q_stat - q) < max(1e-3, 1e-5 * abs(q))


def test_g_test_contingency_replay(spark, sf_dir):
    from excel_to_db_spark.queries.tsdiag import stats_g_test
    row = stats_g_test(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    dow = (ev["ts"].dt.floor("D")
           - pd.Timestamp("1995-01-02")).dt.days.mod(7)
    cells = Counter(zip(ev["event_type"], dow))
    rtot = Counter()
    ctot = Counter()
    for (et, d), o in cells.items():
        rtot[et] += o
        ctot[d] += o
    nn = sum(cells.values())
    snapped = sum(
        round(o * math.log((o * nn) / (rtot[et] * ctot[d])) * 1e6)
        for (et, d), o in cells.items())
    assert row.n == nn
    assert row.df == (len(rtot) - 1) * (len(ctot) - 1)
    assert row.g_stat == _r(2.0 * snapped / 1e6, 5)
    assert 0.0 <= row.p_value <= 1.0
