"""Semantic guards for the calibration batch: HL/z vs direct numpy
recomputation of the shared scored construction, the Newton
recalibration vs an independent float IRLS, KS vs a CDF scan."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _scored(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["n_chars", "lang"])
    maxc = int(d["n_chars"].max())
    conf = np.round(d["n_chars"] / maxc, 6)
    u = np.round(conf * 1e6).astype("int64")
    y = (d["lang"] == "en").astype("int64").to_numpy()
    return u, y


def test_hosmer_lemeshow_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.calib import eval_hosmer_lemeshow
    row = eval_hosmer_lemeshow(spark, sf_dir).collect()[0]
    u, y = _scored(sf_dir)
    bins = np.minimum(np.floor(u / 100000.0).astype(int), 9)
    chi = 0.0
    used = 0
    for b in sorted(set(bins)):
        m = bins == b
        n, o1, e1u = int(m.sum()), int(y[m].sum()), int(u[m].sum())
        if e1u <= 0 or e1u >= n * 1000000:
            continue
        e1 = e1u / 1e6
        t = (o1 - e1) ** 2 / e1 + ((n - o1) - (n - e1)) ** 2 / (n - e1)
        chi += round(t * 1e8)
        used += 1
    assert row.n_bins_used == used
    assert row.df == used - 2
    assert abs(row.hl_chi2 - chi / 1e8) < 1e-3
    assert row.hl_chi2 >= 0


def test_spiegelhalter_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.calib import eval_spiegelhalter_z
    row = eval_spiegelhalter_z(spark, sf_dir).collect()[0]
    u, y = _scored(sf_dir)
    p = u / 1e6
    num = float(np.sum(np.round((y - p) * (1 - 2 * p) * 1e12))) / 1e12
    den = float(np.sum(np.round(
        (1 - 2 * p) ** 2 * p * (1 - p) * 1e12))) / 1e12
    brier = float(np.sum(np.round((y - p) ** 2 * 1e12))) / (1e12 * len(y))
    assert row.n == len(y)
    assert abs(row.brier - brier) < 1e-5
    assert abs(row.z - num / math.sqrt(den)) < 1e-3


def test_calibration_slope_independent_irls(spark, sf_dir):
    from excel_to_db_spark.queries.calib import eval_calibration_slope
    row = eval_calibration_slope(spark, sf_dir).collect()[0]
    u, y = _scored(sf_dir)
    uc = np.clip(u, 10000, 990000)
    x = np.log((uc / 1e6) / (1 - uc / 1e6))
    a, b = 0.0, 1.0
    for _ in range(2):
        pr = 1 / (1 + np.exp(-a - b * x))
        w = pr * (1 - pr)
        ga = float(np.sum(np.round((y - pr) * 1e6))) / 1e6
        gb = float(np.sum(np.round((y - pr) * x * 1e6))) / 1e6
        haa = float(np.sum(np.round(w * 1e6))) / 1e6
        hab = float(np.sum(np.round(w * x * 1e6))) / 1e6
        hbb = float(np.sum(np.round(w * x * x * 1e6))) / 1e6
        det = haa * hbb - hab * hab
        a, b = (a + (hbb * ga - hab * gb) / det,
                b + (haa * gb - hab * ga) / det)
    assert row.n == len(y)
    assert abs(row.cal_intercept - a) < 2e-4
    assert abs(row.cal_slope - b) < 2e-4
    # two Newton steps from (0,1) must move toward a finite fit
    assert np.isfinite(row.cal_slope) and np.isfinite(row.cal_intercept)


def test_ks_separation_cdf_scan(spark, sf_dir):
    from excel_to_db_spark.queries.calib import eval_ks_separation
    row = eval_ks_separation(spark, sf_dir).collect()[0]
    u, y = _scored(sf_dir)
    pos = np.sort(u[y == 1])
    neg = np.sort(u[y == 0])
    grid = np.unique(u)
    cump = np.searchsorted(pos, grid, side="right")
    cumn = np.searchsorted(neg, grid, side="right")
    d_num = int(np.abs(cump * len(neg) - cumn * len(pos)).max())
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert row.d_num == d_num
    assert abs(row.ks - d_num / (len(pos) * len(neg))) < 1e-6
    assert 0 <= row.ks <= 1
