"""Semantic guards for the sampling-eval/ops batch: pass@k vs an
exact-combinatorics replay, overdispersion panel vs pandas moments,
burn-rate windows vs a calendar-aware replay, and Bradley-Terry's MM
fixpoint replayed in integer arithmetic."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_pass_at_k_matches_combinatorics(spark, sf_dir):
    from excel_to_db_spark.queries.evalops import eval_pass_at_k
    got = {r.k: r for r in eval_pass_at_k(spark, sf_dir).collect()}
    ev = (pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "event_type", "ts",
                                   "event_id"])
          .sort_values(["user_id", "ts", "event_id"]))
    ev["rn"] = ev.groupby("user_id").cumcount() + 1
    capped = ev[ev["rn"] <= 50]
    tasks = capped.groupby("user_id").agg(
        n=("event_type", "size"),
        c=("event_type", lambda s: int((s == "purchase").sum())))
    for k in (1, 5, 10):
        el = tasks[tasks["n"] >= k]
        assert got[k].n_tasks == len(el)
        if len(el) == 0:
            assert got[k].mean_pass is None
            continue
        acc = 0
        for _, t in el.iterrows():
            n, c = int(t["n"]), int(t["c"])
            if n - c < k:
                p = 1.0
            else:
                p = 1.0 - (math.comb(n - c, k) / math.comb(n, k))
            acc += round(p * 1e6)
        assert got[k].mean_pass == _r(acc / (1e6 * len(el)), 6)
    # monotone: more draws can only help
    ks = [k for k in (1, 5, 10) if got[k].mean_pass is not None]
    for a, b in zip(ks, ks[1:]):
        assert got[b].mean_pass >= got[a].mean_pass


def test_overdispersion_matches_moments(spark, sf_dir):
    from excel_to_db_spark.queries.evalops import stats_overdispersion
    row = stats_overdispersion(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    n = ev.groupby("user_id").size().astype("int64")
    g = len(n)
    assert row.n_users == g
    m = _r(int(n.sum()) / g, 6)
    v = _r((int((n ** 2).sum()) - int(n.sum()) / g * int(n.sum()))
           / (g - 1), 6)
    assert (row.mean_n, row.var_n) == (m, v)
    assert row.dispersion_index == _r(v / m, 6)
    assert row.poisson_chi2 == _r((g - 1) * v / m, 4)
    if v > m:
        assert row.nb_r == _r(m * m / (v - m), 6)
        assert row.nb_p == _r(m / v, 6)
    else:
        assert row.nb_r is None and row.nb_p is None


def test_slo_burn_windows_calendar_aware(spark, sf_dir):
    from excel_to_db_spark.queries.evalops import ops_slo_burn
    rows = {r.hour_epoch: r for r in ops_slo_burn(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    # parquet stores ts as timestamp[us] — normalize to epoch seconds
    # via the [s] view instead of assuming nanosecond int64
    h = (ev["ts"].astype("datetime64[s]").astype("int64")
         // 3600).astype("int64")
    err = (ev["event_type"] == "error").astype(int)
    hourly = pd.DataFrame({"h": h, "e": err}).groupby("h").agg(
        n=("e", "size"), e=("e", "sum"))
    for hh, r in rows.items():
        assert r.n == hourly.loc[hh, "n"]
        assert r.e == hourly.loc[hh, "e"]
        # trailing 6 CALENDAR hours (missing hours shrink the mass)
        win = hourly[(hourly.index >= hh - 5) & (hourly.index <= hh)]
        assert r.rate_6h == _r(int(win["e"].sum()) / int(win["n"].sum()),
                               6)
        assert r.page == (r.burn_1h > 1.0 and r.burn_6h > 1.0)
    assert len(rows) == len(hourly)


def test_bradley_terry_mm_replay(spark, sf_dir):
    from excel_to_db_spark.queries.evalops import stats_bradley_terry
    got = [(r.item, r.total_wins, r.strength_micro, r.rank)
           for r in stats_bradley_terry(spark, sf_dir).collect()]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["d"] = ev["ts"].dt.floor("D")
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    cell = (ev.groupby(["d", "event_type"])["cents"]
            .agg(["sum", "count"]))
    cell["mm"] = np.floor(cell["sum"] * 10.0 / cell["count"]
                          + 0.5).astype("int64")
    items = sorted(ev["event_type"].unique())
    w = {(i, j): 0 for i in items for j in items if i != j}
    for _, blk in cell.reset_index().groupby("d"):
        vals = dict(zip(blk["event_type"], blk["mm"]))
        for i, j in combinations(items, 2):
            if vals[i] > vals[j]:
                w[(i, j)] += 1
            elif vals[j] > vals[i]:
                w[(j, i)] += 1
    wins = {i: sum(w[(i, j)] for j in items if j != i) for i in items}
    p = {i: 1_000_000 for i in items}
    for _ in range(3):
        upd = {}
        for i in items:
            denom_u = sum(
                round((w[(i, j)] + w[(j, i)]) * 1e12 / (p[i] + p[j]))
                for j in items if j != i)
            upd[i] = round(wins[i] * 1e6 / (denom_u / 1e12))
        mx = max(upd.values())
        p = {i: upd[i] * 1_000_000 // mx for i in items}
    want = sorted(((i, wins[i], p[i]) for i in items),
                  key=lambda t: (-t[2], t[0]))
    want = [(i, wi, pi, rk) for rk, (i, wi, pi) in enumerate(want, 1)]
    assert got == want
