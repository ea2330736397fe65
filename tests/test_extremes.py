"""Semantic guards for the extremes/drift batch: Gumbel MoM algebra,
Hurst R/S vs a numpy block replay, Grubbs vs direct max-z, and
Page-Hinkley vs a sequential loop."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_EULER = 0.5772156649015329


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _hourly_cents(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    return (pd.DataFrame({"h": ev["ts"].dt.floor("h"), "c": cents})
            .groupby("h")["c"].sum().sort_index())


def test_gumbel_mom_and_return_level(spark, sf_dir):
    from excel_to_db_spark.queries.extremes import stats_gumbel_maxima
    row = stats_gumbel_maxima(spark, sf_dir).collect()[0]
    hr = _hourly_cents(sf_dir)
    bmax = hr.groupby(hr.index.floor("D")).max().to_numpy(
        dtype="float64")
    n = len(bmax)
    sd = math.sqrt(float(np.var(bmax)))       # population std
    beta = sd * math.sqrt(6.0) / math.pi
    mu = float(bmax.mean()) - _EULER * beta
    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 365.0))
    assert row.n_blocks == n
    assert abs(row.beta_hat - beta / 100.0) < 1e-3
    assert abs(row.mu_hat - mu / 100.0) < 1e-3
    assert abs(row.return_level_365 - rl / 100.0) < 1e-3
    # a once-a-year day tops every block mean by construction
    assert row.return_level_365 > row.mu_hat


def test_hurst_rs_numpy_block_replay(spark, sf_dir):
    from excel_to_db_spark.queries.extremes import ts_hurst_exponent
    row = ts_hurst_exponent(spark, sf_dir).collect()[0]
    x = _hourly_cents(sf_dir).to_numpy(dtype="float64")

    def mean_rs(b):
        vals = []
        for i in range(len(x) // b):
            blk = x[i * b:(i + 1) * b]
            z = np.cumsum(blk - blk.mean())
            s = blk.std()           # population
            vals.append(round((z.max() - z.min()) / s * 1e6) / 1e6)
        return len(vals), sum(vals) / len(vals)

    n8, rs8 = mean_rs(8)
    n32, rs32 = mean_rs(32)
    assert (row.blocks_8, row.blocks_32) == (n8, n32)
    assert abs(row.rs_8 - rs8) < 1e-4
    assert abs(row.rs_32 - rs32) < 1e-4
    h = (math.log(rs32) - math.log(rs8)) / math.log(4.0)
    assert abs(row.hurst - h) < 1e-3
    assert 0.0 < row.hurst < 1.0


def test_grubbs_direct_max_z(spark, sf_dir):
    from excel_to_db_spark.queries.extremes import stats_grubbs_outlier
    row = stats_grubbs_outlier(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().sort_index())
    x = daily.to_numpy(dtype="float64")
    s = x.std(ddof=1)
    g = float(np.max(np.abs(x - x.mean())) / s)
    assert row.n == len(x)
    assert abs(row.g_stat - g) < 1e-3
    assert row.extreme_day == daily.index[
        int(np.argmax(np.abs(x - x.mean())))]


def test_page_hinkley_sequential_loop(spark, sf_dir):
    from excel_to_db_spark.queries.extremes import ts_page_hinkley
    row = ts_page_hinkley(spark, sf_dir).collect()[0]
    ser = _hourly_cents(sf_dir)
    x = ser.to_numpy(dtype="float64")
    m, mn, best, best_i = 0.0, 0.0, -1.0, 0
    px = 0.0
    for t, v in enumerate(x, start=1):
        px += v
        m += v - px / t
        mn = min(mn, m)
        ph = m - mn
        if ph > best:
            best, best_i = ph, t - 1
    assert row.n == len(x)
    assert abs(row.ph_stat - best / 100.0) < 0.02
    assert row.peak_hour == ser.index[best_i]
    sigma = x.std()                     # population
    assert abs(row.ph_norm - best / sigma) < 1e-3
    assert row.ph_stat >= 0.0
