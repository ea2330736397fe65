"""Semantic guards for the classical-inference batch: ANCOVA vs numpy
residual fits, ARCH LM vs squared-return regression, Spearman-Brown
algebra, and Mood's median vs a crosstab replay."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_ancova_numpy_residual_fits(spark, sf_dir):
    from excel_to_db_spark.queries.classic2 import stats_ancova
    row = stats_ancova(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_quantity",
                                  "l_extendedprice"])
    g = (li["l_shipdate"].dt.floor("D")
         - pd.Timestamp("1995-01-02")).dt.days.mod(7)
    x = np.floor(li["l_quantity"] + 0.5).astype("int64")\
        .to_numpy(dtype="float64")
    y = np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")\
        .to_numpy(dtype="float64")
    k, n = g.nunique(), len(y)

    def cen(xs, ys):
        xc, yc = xs - xs.mean(), ys - ys.mean()
        return (float((xc * xc).sum()), float((xc * yc).sum()),
                float((yc * yc).sum()))

    # ANCOVA pools ONE common slope over the within-group moments
    wxx = wxy = wyy = 0.0
    for gg in sorted(g.unique()):
        m = (g == gg).to_numpy()
        a, b, c2 = cen(x[m], y[m])
        wxx += a
        wxy += b
        wyy += c2
    sse_w = wyy - wxy * wxy / wxx
    a, b, c2 = cen(x, y)
    sse_t = c2 - b * b / a
    f = ((sse_t - sse_w) / (k - 1)) / (sse_w / (n - k - 1))
    assert (row.k_groups, row.n) == (k, n)
    assert abs(row.f_adjusted - f) < max(1e-2, 1e-3 * abs(f))


def test_arch_lm_squared_regression(spark, sf_dir):
    from excel_to_db_spark.queries.classic2 import ts_arch_lm
    row = ts_arch_lm(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().sort_index().to_numpy())
    r = np.round(np.log(daily[1:] / daily[:-1]) * 1e6)
    r2 = (r * r)[1:]
    r2l = (r * r)[:-1]
    n = len(r2)
    rho = np.corrcoef(r2l, r2)[0, 1]
    lm = n * rho * rho
    assert row.n == n
    assert abs(row.lm_stat - lm) < max(1e-3, 1e-3 * lm)
    assert 0.0 <= row.p_value <= 1.0


def test_spearman_brown_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.classic2 import (
        stats_split_half_reliability)
    row = stats_split_half_reliability(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    piv = (ev.groupby(["user_id", "event_type"]).size()
           .unstack(fill_value=0))
    for col in ("click", "view", "purchase", "signup"):
        if col not in piv:
            piv[col] = 0
    h1 = piv["click"] + piv["view"]
    h2 = piv["purchase"] + piv["signup"]
    r = _r(float(np.corrcoef(h1, h2)[0, 1]), 6)
    assert row.n == len(piv)
    assert row.r_half == r
    assert row.spearman_brown == _r(2.0 * r / (1.0 + r), 6)
    # prophecy lengthening can only increase positive reliability
    if r > 0:
        assert row.spearman_brown > row.r_half


def test_mood_median_crosstab_replay(spark, sf_dir):
    from excel_to_db_spark.queries.classic2 import stats_mood_median
    row = stats_mood_median(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    c = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    srt = np.sort(c.to_numpy())
    n = len(srt)
    gm = int(srt[(n + 1) // 2 - 1])   # lower/upper-median rank rule
    df = pd.DataFrame({"g": ev["event_type"].to_numpy(),
                       "above": (c > gm).astype(int).to_numpy()})
    cells = df.groupby("g")["above"].agg(["sum", "size"])
    ta = int(cells["sum"].sum())
    tb = int((cells["size"] - cells["sum"]).sum())
    chi = 0.0
    for _, rec in cells.iterrows():
        a, b = int(rec["sum"]), int(rec["size"] - rec["sum"])
        ea = (a + b) * ta / (ta + tb)
        eb = (a + b) * tb / (ta + tb)
        chi += round(((a - ea) ** 2 / ea + (b - eb) ** 2 / eb) * 1e8)
    assert row.k_groups == 5
    assert row.chi2 == _r(chi / 1e8, 4)
    assert 0.0 <= row.p_value <= 1.0
