"""Semantic guards for the post-hoc/survival/causal batch: Dunn z
vs a pandas midrank replay, Nelson-Aalen vs a sequential risk-set
loop, Granger vs two numpy OLS fits, and RD vs side-by-side
polyfits."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_dunn_pandas_midrank_replay(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc import stats_dunn_posthoc
    rows = {(r.grp_a, r.grp_b): r
            for r in stats_dunn_posthoc(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev["rk"] = ev["c"].rank(method="average")
    n = len(ev)
    ties = ev["c"].value_counts()
    tsum = int((ties ** 3 - ties).sum())
    g = ev.groupby("event_type")["rk"].agg(["mean", "size"])
    grps = sorted(g.index)
    assert len(rows) == 10
    for i, ga in enumerate(grps):
        for gb in grps[i + 1:]:
            z = (g.loc[ga, "mean"] - g.loc[gb, "mean"]) / math.sqrt(
                (n * (n + 1) / 12.0 - tsum / (12.0 * (n - 1)))
                * (1.0 / g.loc[ga, "size"] + 1.0 / g.loc[gb, "size"]))
            row = rows[(ga, gb)]
            assert abs(row.z - z) < 2e-5
            assert 0.0 <= row.p_value <= 1.0
            assert row.p_bonferroni == min(
                1.0, _r(10.0 * row.p_value, 8))


def test_nelson_aalen_sequential_loop(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc import stats_nelson_aalen
    rows = stats_nelson_aalen(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_orderkey"])
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    o["nxt"] = o.groupby("o_custkey")["o_orderdate"].shift(-1)
    mx = o["o_orderdate"].max().floor("D")
    t = np.where(o["nxt"].isna(),
                 (mx - o["o_orderdate"].dt.floor("D")).dt.days,
                 (o["nxt"].dt.floor("D")
                  - o["o_orderdate"].dt.floor("D")).dt.days)
    ev = (~o["nxt"].isna()).astype(int).to_numpy()
    df = pd.DataFrame({"t": t, "ev": ev})
    hist = df.groupby("t").agg(m=("ev", "size"), d=("ev", "sum"))
    hist = hist.sort_index(ascending=False)
    hist["n_risk"] = hist["m"].cumsum()
    hist = hist.sort_index()
    hcum, out = 0, {}
    for tt, rec in hist.iterrows():
        if rec["d"] > 0:
            hcum += round(rec["d"] / rec["n_risk"] * 1e9)
            out[tt] = (rec["d"], rec["n_risk"], hcum)
    assert len(rows) == len(out)
    for r in rows:
        d, nr, hc = out[r.duration]
        assert (r.n_events, r.n_risk) == (d, nr)
        assert r.cum_hazard == _r(hc / 1e9, 6)
        assert r.surv_na == _r(math.exp(-hc / 1e9), 6)
    # the hazard curve is nondecreasing
    hz = [r.cum_hazard for r in sorted(rows, key=lambda r: r.duration)]
    assert all(a <= b for a, b in zip(hz, hz[1:]))


def test_granger_two_ols_fits(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc import ts_granger_causality
    row = ts_granger_causality(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = ev["ts"].dt.floor("D")
    day = (ev.pivot_table(index="d", columns="event_type", values="c",
                          aggfunc="sum", fill_value=0)
           .sort_index())
    y = day["purchase"].to_numpy(dtype="float64")[1:]
    z1 = day["purchase"].to_numpy(dtype="float64")[:-1]
    z2 = day["click"].to_numpy(dtype="float64")[:-1]
    n = len(y)
    X_r = np.column_stack([np.ones(n), z1])
    X_u = np.column_stack([np.ones(n), z1, z2])
    rss_r = float(((y - X_r @ np.linalg.lstsq(X_r, y, rcond=None)[0])
                   ** 2).sum())
    rss_u = float(((y - X_u @ np.linalg.lstsq(X_u, y, rcond=None)[0])
                   ** 2).sum())
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    assert row.n == n
    assert abs(row.f_stat - f) < max(1e-3, 1e-4 * abs(f))
    assert 0.0 <= row.p_approx <= 1.0


def test_rd_side_polyfits(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc import stats_reg_discontinuity
    row = stats_reg_discontinuity(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice", "o_orderpriority"])
    xc = (np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
          - 15000000)
    y = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(float)
    keep = np.abs(xc) <= 5000000
    xc, y = xc[keep].to_numpy(dtype="float64"), y[keep].to_numpy()
    left, right = xc < 0, xc >= 0
    bl = np.polyfit(xc[left], y[left], 1)
    br = np.polyfit(xc[right], y[right], 1)
    assert (row.n_left, row.n_right) == (int(left.sum()),
                                         int(right.sum()))
    assert abs(row.level_left - bl[1]) < 1e-5
    assert abs(row.level_right - br[1]) < 1e-5
    assert abs(row.rd_jump - (br[1] - bl[1])) < 2e-5
    # the synthetic corpus has no discontinuity: the jump is small
    assert abs(row.rd_jump) < 0.1
