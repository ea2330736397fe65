"""Semantic guards for the distribution-distance batch: Kuiper vs a
numpy CDF scan (and the V >= KS dominance), CvM/AD vs direct
integral recomputation, W1 vs numpy's sorted-sample form, energy
distance vs the O(n^2) double sum on a subsample."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _samples(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    a = np.sort(cents[ev["event_type"] == "click"].to_numpy())
    b = np.sort(cents[ev["event_type"] == "purchase"].to_numpy())
    return a, b


def _grid_cums(a, b):
    grid = np.unique(np.concatenate([a, b]))
    cuma = np.searchsorted(a, grid, side="right")
    cumb = np.searchsorted(b, grid, side="right")
    return grid, cuma, cumb


def test_kuiper_vs_numpy_and_ks_dominance(spark, sf_dir):
    from excel_to_db_spark.queries.distdist import stats_kuiper_two_sample
    row = stats_kuiper_two_sample(spark, sf_dir).collect()[0]
    a, b = _samples(sf_dir)
    _, cuma, cumb = _grid_cums(a, b)
    x = cuma * len(b) - cumb * len(a)
    assert row.d_plus_num == max(int(x.max()), 0)
    assert row.d_minus_num == max(int(-x.min()), 0)
    v = (row.d_plus_num + row.d_minus_num) / (len(a) * len(b))
    assert abs(row.v_stat - v) < 1e-6
    ks = max(row.d_plus_num, row.d_minus_num) / (len(a) * len(b))
    assert row.v_stat >= ks - 1e-9  # V = D+ + D- >= max(D+, D-)


def test_cvm_ad_integral_recompute(spark, sf_dir):
    from excel_to_db_spark.queries.distdist import (stats_ad_two_sample,
                                                    stats_cvm_two_sample)
    cvm = stats_cvm_two_sample(spark, sf_dir).collect()[0]
    ad = stats_ad_two_sample(spark, sf_dir).collect()[0]
    a, b = _samples(sf_dir)
    n1, n2 = len(a), len(b)
    nn = n1 + n2
    grid, cuma, cumb = _grid_cums(a, b)
    w = (np.searchsorted(a, grid, side="right")
         - np.searchsorted(a, grid, side="left")
         + np.searchsorted(b, grid, side="right")
         - np.searchsorted(b, grid, side="left"))
    x = (cuma * n2 - cumb * n1).astype("float64")
    t = float(np.sum(np.round(
        w * x * x / (float(nn) * nn * n1 * n2) * 1e12))) / 1e12
    assert abs(cvm.cvm_t - t) < 1e-5
    h = cuma + cumb
    keep = h < nn
    a2 = float(np.sum(np.round(
        (w * x * x * nn
         / (float(n1) * n2 * h * (nn - h)))[keep] * 1e12))) / 1e12
    assert abs(ad.ad_a2 - a2) < 1e-5
    assert cvm.cvm_t >= 0 and ad.ad_a2 >= 0


def test_wasserstein_energy_closed_forms(spark, sf_dir):
    from excel_to_db_spark.queries.distdist import stats_wasserstein_energy
    row = stats_wasserstein_energy(spark, sf_dir).collect()[0]
    a, b = _samples(sf_dir)
    n1, n2 = len(a), len(b)
    grid, cuma, cumb = _grid_cums(a, b)
    gap = np.diff(grid)
    f1, f2 = cuma[:-1] / n1, cumb[:-1] / n2
    w1 = float(np.sum(np.abs(f1 - f2) * gap)) / 100
    assert abs(row.w1_dollars - w1) < 1e-5
    # E|X-Y| via the direct mean over all cross pairs (subsampled)
    rng = np.random.default_rng(7)
    sa = rng.choice(a, size=min(400, n1), replace=False)
    sb = rng.choice(b, size=min(400, n2), replace=False)
    exy_direct = float(np.abs(
        sa[:, None] - sb[None, :]).mean()) / 100
    # closed form must sit near the subsampled direct estimate
    assert abs(row.e_xy - exy_direct) / max(exy_direct, 1e-9) < 0.25
    # energy identity and nonnegativity
    assert abs(row.energy_dist
               - (2 * row.e_xy - row.e_xx - row.e_yy)) < 5e-6
    assert row.energy_dist >= -1e-9
    # exact closed-form E|X-X'| on the full sample
    exx = 2 * float(np.sum((cuma[:-1] / n1)
                           * (1 - cuma[:-1] / n1) * gap)) / 100
    assert abs(row.e_xx - exx) < 1e-5
