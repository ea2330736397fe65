"""Semantic guards for the regression-diagnostics batch: Huber IRLS
vs a numpy loop, Cook's distance vs statsmodels-free formulas, ridge
path vs numpy solves, and Breusch-Pagan vs an explicit auxiliary
regression."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _daily_orders(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    return (pd.DataFrame({"d": o["o_orderdate"].dt.floor("D"),
                          "c": cents})
            .groupby("d")["c"].sum().sort_index())


def test_huber_irls_numpy_loop(spark, sf_dir):
    from excel_to_db_spark.queries.regdiag import stats_huber_m_estimate
    row = stats_huber_m_estimate(spark, sf_dir).collect()[0]
    x = _daily_orders(sf_dir).to_numpy(dtype="float64")
    mu = x.mean()
    k = 1.345 * x.std()          # population sigma
    for _ in range(2):
        w = np.minimum(1.0, k / np.abs(x - mu))
        mu = float((w * x).sum() / w.sum())
    assert row.n == len(x)
    assert abs(row.huber_mu - mu / 100.0) < 0.5
    assert 0.0 < row.mean_weight <= 1.0
    # robust location sits between median and mean
    lo, hi = sorted([float(np.median(x)), float(x.mean())])
    assert lo / 100.0 - 1.0 <= row.huber_mu <= hi / 100.0 + 1.0


def test_cooks_distance_formulas(spark, sf_dir):
    from excel_to_db_spark.queries.regdiag import stats_cooks_distance
    rows = stats_cooks_distance(spark, sf_dir).collect()
    y = _daily_orders(sf_dir).to_numpy(dtype="float64")
    t = np.arange(len(y), dtype="float64")
    n = len(y)
    b = float(np.cov(t, y, bias=True)[0, 1] / np.var(t))
    a = y.mean() - b * t.mean()
    e = y - a - b * t
    sttc = float(((t - t.mean()) ** 2).sum())
    h = 1.0 / n + (t - t.mean()) ** 2 / sttc
    s2 = float((e ** 2).sum() / (n - 2))
    cd = (e ** 2 / (2.0 * s2)) * (h / (1.0 - h) ** 2)
    top = np.argsort(-cd)[:5]
    assert len(rows) == 5
    got = sorted(r.cooks_d for r in rows)
    want = sorted(_r(cd[i], 6) for i in top)
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-5
    assert rows[0].cooks_d == max(r.cooks_d for r in rows)


def test_ridge_path_numpy_solves(spark, sf_dir):
    from excel_to_db_spark.queries.regdiag import ml_ridge_path
    rows = {r.lam_rel: r for r in ml_ridge_path(spark, sf_dir).collect()}
    y = _daily_orders(sf_dir).to_numpy(dtype="float64")
    t = np.arange(len(y), dtype="float64")
    t2 = t * t
    X = np.column_stack([t - t.mean(), t2 - t2.mean()])
    yc = y - y.mean()
    C = X.T @ X / len(y)
    c = X.T @ yc / len(y)
    assert set(rows) == {0.0, 0.1, 1.0, 10.0}
    prev_norm = None
    for lr in [0.0, 0.1, 1.0, 10.0]:
        lam = lr * np.trace(C) / 2.0
        bb = np.linalg.solve(C + lam * np.eye(2), c)
        assert abs(rows[lr].b1_x1e6 - bb[0] * 1e6) < 2e-3
        assert abs(rows[lr].b2_x1e9 - bb[1] * 1e9) < 2e-3
        norm = bb @ bb
        if prev_norm is not None:       # shrinkage is monotone
            assert norm <= prev_norm + 1e-12
        prev_norm = norm


def test_breusch_pagan_aux_regression(spark, sf_dir):
    from excel_to_db_spark.queries.regdiag import stats_breusch_pagan
    row = stats_breusch_pagan(spark, sf_dir).collect()[0]
    y = _daily_orders(sf_dir).to_numpy(dtype="float64")
    t = np.arange(len(y), dtype="float64")
    n = len(y)
    b = float(np.cov(t, y, bias=True)[0, 1] / np.var(t))
    a = y.mean() - b * t.mean()
    v = np.round((y - a - b * t) ** 2 / 1e10)
    r = np.corrcoef(t, v)[0, 1]
    lm = n * r * r
    assert row.n == n
    assert abs(row.lm_stat - lm) < max(1e-2, 1e-3 * lm)
    assert 0.0 <= row.p_value <= 1.0
