"""Semantic guards for the meta-analysis/decomposition batch: DL
heterogeneity vs a numpy replay, Theil additivity against the direct
total, Fano curve vs pandas window counts, and the AM>=GM>=HM
inequality."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _orders_by_nation(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    return o.merge(c, left_on="o_custkey", right_on="c_custkey")


def test_meta_analysis_numpy_replay(spark, sf_dir):
    from excel_to_db_spark.queries.metapanel import stats_meta_analysis
    row = stats_meta_analysis(spark, sf_dir).collect()[0]
    j = _orders_by_nation(sf_dir)
    j["urgent"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    g = j.groupby("c_nationkey")["urgent"].agg(["sum", "size"])
    g = g[(g["sum"] > 0) & (g["sum"] < g["size"])]
    d = np.array([round((x / n - 0.4) * 1e8) / 1e8
                  for x, n in zip(g["sum"], g["size"])])
    w = np.array([round(n / ((x / n) * (1 - x / n)) * 1e4) / 1e4
                  for x, n in zip(g["sum"], g["size"])])
    k = len(d)
    mu = float((w * d).sum() / w.sum())
    q = float((w * (d - mu) ** 2).sum())
    assert row.n_sites == k
    assert abs(row.mu_fixed - mu) < 1e-5
    assert abs(row.cochran_q - q) < max(1e-3, 1e-3 * q)
    i2 = max(0.0, (q - (k - 1)) / q)
    assert abs(row.i_squared - i2) < 1e-3
    assert 0.0 <= row.i_squared < 1.0
    tau2 = max(0.0, (q - (k - 1)) / (w.sum() - (w * w).sum() / w.sum()))
    assert abs(row.tau2_x1e4 - tau2 * 1e4) < max(1e-3,
                                                 1e-2 * tau2 * 1e4)


def test_theil_decomposition_adds_to_total(spark, sf_dir):
    from excel_to_db_spark.queries.metapanel import (
        stats_theil_decomposition)
    from excel_to_db_spark.queries.inequality import stats_theil_index
    row = stats_theil_decomposition(spark, sf_dir).collect()[0]
    total = stats_theil_index(spark, sf_dir).collect()[0].theil_t
    assert row.theil_total == _r(row.theil_between + row.theil_within,
                                 6)
    # decomposition reproduces the directly computed index
    assert abs(row.theil_total - total) < 1e-4
    assert row.theil_between >= 0 and row.theil_within >= 0


def test_fano_curve_pandas_windows(spark, sf_dir):
    from excel_to_db_spark.queries.metapanel import events_fano_curve
    rows = {r.window_seconds: r
            for r in events_fano_curve(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    s = (ev["ts"].astype("datetime64[ns]").astype("int64") // 10 ** 9)
    assert set(rows) == {60, 600, 3600}
    for w in (60, 600, 3600):
        cnt = (s // w).value_counts().to_numpy(dtype="float64")
        fano = float(cnt.var() / cnt.mean())
        r = rows[w]
        assert r.n_windows == len(cnt)
        assert r.mean_count == _r(cnt.mean(), 4)
        assert abs(r.fano - fano) < 1e-3
    # occupied-window Fano is nonnegative everywhere
    assert all(r.fano >= 0 for r in rows.values())


def test_pythagorean_inequality(spark, sf_dir):
    from excel_to_db_spark.queries.metapanel import agg_pythagorean_means
    rows = agg_pythagorean_means(spark, sf_dir).collect()
    j = _orders_by_nation(sf_dir)
    j["c"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype("int64")
    for r in rows:
        x = j.loc[j["c_nationkey"] == r.nation, "c"]\
            .to_numpy(dtype="float64")
        assert r.n == len(x)
        assert r.am == _r(x.mean() / 100.0, 4)
        l_u = sum(round(math.log(v) * 1e6) for v in x)
        assert r.gm == _r(math.exp(l_u / (len(x) * 1e6)) / 100.0, 4)
        r_u = sum(round(1e12 / v) for v in x)
        assert r.hm == _r(len(x) * 1e12 / r_u / 100.0, 4)
        # snapped values still track the unsnapped truth closely
        assert abs(r.hm - len(x) / (1.0 / x).sum() / 100.0) \
            < 5e-5 * r.hm + 0.01
        # the Pythagorean chain
        assert r.am >= r.gm >= r.hm
    assert len(rows) == 25
