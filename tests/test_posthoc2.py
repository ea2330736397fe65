"""Semantic guards for the trend/post-hoc/cost batch: Cochran-
Armitage vs a quintile replay, Tukey q vs pooled-variance formulas,
cost threshold vs an exhaustive sweep, and DEFF vs ANOVA ICC."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _pv(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["purchase", "view"])].copy()
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev["y"] = (ev["event_type"] == "purchase").astype(int)
    return ev


def test_cochran_armitage_quintile_replay(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc2 import stats_cochran_armitage
    row = stats_cochran_armitage(spark, sf_dir).collect()[0]
    ev = _pv(sf_dir)
    c = np.sort(ev["c"].to_numpy())
    n = len(c)
    ubs = [int(c[(q * n + 4) // 5 - 1]) for q in range(1, 5)]
    grp = np.searchsorted(ubs, ev["c"].to_numpy(), side="left")
    df = pd.DataFrame({"g": grp, "y": ev["y"].to_numpy()})
    cells = df.groupby("g")["y"].agg(["size", "sum"])
    nn = int(cells["size"].sum())
    rr = int(cells["sum"].sum())
    sgr = int((cells.index * cells["sum"]).sum())
    sgn = int((cells.index * cells["size"]).sum())
    sggn = int((cells.index ** 2 * cells["size"]).sum())
    z = (sgr - rr * sgn / nn) / math.sqrt(
        rr * (nn - rr) / nn * (sggn - sgn * sgn / nn) / nn)
    assert row.n == nn
    assert abs(row.z - z) < 2e-5
    assert 0.0 <= row.p_value <= 1.0


def test_tukey_hsd_pooled_variance(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc2 import stats_tukey_hsd
    rows = {(r.grp_a, r.grp_b): r
            for r in stats_tukey_hsd(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    g = ev.groupby("event_type")["c"].agg(["size", "sum", "mean"])
    ssw = sum(round(((grp["c"] - grp["c"].mean()) ** 2).sum() * 1e2)
              / 1e2 for _, grp in ev.groupby("event_type"))
    n, k = len(ev), len(g)
    s2w = ssw / (n - k)
    assert len(rows) == 10
    for (ga, gb), r in rows.items():
        na, nb = int(g.loc[ga, "size"]), int(g.loc[gb, "size"])
        diff = g.loc[ga, "sum"] / na - g.loc[gb, "sum"] / nb
        q = abs(diff) / math.sqrt(s2w / 2.0 * (1.0 / na + 1.0 / nb))
        assert r.mean_diff == _r(diff / 100.0, 4)
        assert abs(r.q_stat - q) < 2e-4
        assert r.significant_05 == (1 if r.q_stat > 3.86 else 0)


def test_cost_threshold_exhaustive_sweep(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc2 import ml_cost_threshold
    row = ml_cost_threshold(spark, sf_dir).collect()[0]
    ev = _pv(sf_dir)
    b = ev["c"] // 1000
    hist = (pd.DataFrame({"b": b, "y": ev["y"]})
            .groupby("b")["y"].agg(["size", "sum"]).sort_index())
    cl = pl = 0
    ct, pt = int(hist["size"].sum()), int(hist["sum"].sum())
    # the all-positive endpoint sits below every bucket
    best = (ct - pt, int(hist.index.min()) - 1)
    for thr, rec in hist.iterrows():
        cl += int(rec["size"])
        pl += int(rec["sum"])
        cost = 5 * pl + (ct - cl - (pt - pl))
        if cost < best[0]:
            best = (cost, thr)
    assert (row.threshold, row.expected_cost) == (best[1], best[0])
    assert row.trivial_cost == min(5 * pt, ct - pt)
    assert row.cost_reduction == _r(1.0 - best[0]
                                    / min(5 * pt, ct - pt), 6)
    # the sweep includes the all-positive endpoint, so it can never
    # lose to the trivial policy
    assert 0.0 <= row.cost_reduction < 1.0


def test_design_effect_anova_icc(spark, sf_dir):
    from excel_to_db_spark.queries.posthoc2 import stats_design_effect
    row = stats_design_effect(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    grp = ev.groupby("user_id")["c"].agg(["size", "sum"])
    g, n = len(grp), len(ev)
    t = int(grp["sum"].sum())
    q = float((ev["c"].astype("float64") ** 2).sum())
    ssg = sum(round(s * s / m * 1e2) / 1e2
              for s, m in zip(grp["sum"], grp["size"]))
    msb = (ssg - t * t / n) / (g - 1)
    msw = (q - ssg) / (n - g)
    mbar = n / g
    rho = (msb - msw) / (msb + (mbar - 1.0) * msw)
    assert (row.n_users, row.n_events) == (g, n)
    assert abs(row.icc - rho) < 1e-5
    deff = 1.0 + (mbar - 1.0) * rho
    assert abs(row.deff - deff) < 1e-3
    assert abs(row.n_effective - n / deff) < 1.0
    assert row.deff > 0
