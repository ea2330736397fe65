"""Semantic guards for the flow-diagnostics batch: streaming Apdex vs
the batch key, heartbeat gaps vs a pandas diff replay, rolling beta
vs per-window polyfits, and Shapley efficiency/symmetry axioms."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_stream_apdex_equals_batch(spark, sf_dir):
    from excel_to_db_spark.queries.flowdiag import stream_apdex
    from excel_to_db_spark.queries.offpolicy import ops_apdex
    got = {r.service: r for r in stream_apdex(spark, sf_dir).collect()}
    want = {r.service: r for r in ops_apdex(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for svc in want:
        g, w = got[svc], want[svc]
        assert (g.n, g.satisfied, g.tolerating, g.apdex) == \
            (w.n, w.satisfied, w.tolerating, w.apdex)


def test_heartbeat_gaps_pandas_diff(spark, sf_dir):
    from excel_to_db_spark.queries.flowdiag import events_heartbeat_gaps
    rows = {r.stream: r
            for r in events_heartbeat_gaps(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_id", "event_type"])
    ev = ev.sort_values(["event_type", "ts", "event_id"])
    for stream, grp in ev.groupby("event_type"):
        s = (grp["ts"].astype("datetime64[ns]").astype("int64")
             // 10 ** 9).to_numpy()
        gaps = np.diff(s)
        n, tot = len(gaps), int(gaps.sum())
        silent = int((gaps * n > 3 * tot).sum())
        row = rows[stream]
        assert (row.n_gaps, row.max_gap_s) == (n, int(gaps.max()))
        assert row.mean_gap_s == _r(tot / n, 2)
        assert row.n_silent == silent


def test_rolling_beta_window_polyfits(spark, sf_dir):
    from excel_to_db_spark.queries.flowdiag import window_rolling_beta
    rows = {r.day: r.beta7
            for r in window_rolling_beta(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = ev["ts"].dt.floor("D")
    piv = (ev.pivot_table(index="d", columns="event_type", values="c",
                          aggfunc="sum", fill_value=0).sort_index())
    x = piv["click"].to_numpy(dtype="float64")
    y = piv["purchase"].to_numpy(dtype="float64")
    assert len(rows) == len(x) - 6
    for i in range(6, len(x)):
        xx, yy = x[i - 6:i + 1], y[i - 6:i + 1]
        beta = float(np.cov(xx, yy, bias=True)[0, 1] / np.var(xx))
        assert abs(rows[piv.index[i]] - beta) < 1e-4


def test_shapley_axioms_and_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.flowdiag import attribution_shapley
    rows = {r.channel: r
            for r in attribution_shapley(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    touch = {}
    conv = {}
    for uid, grp in ev.groupby("user_id"):
        types = set(grp["event_type"])
        touch[uid] = frozenset(
            c for c in ("click", "view", "signup") if c in types)
        conv[uid] = 1 if "purchase" in types else 0

    def v(S):
        return sum(c for u, c in conv.items() if touch[u] <= S)

    chans = ("click", "view", "signup")
    phi = {}
    wts = {0: 1 / 3, 1: 1 / 6, 2: 1 / 3}
    for ch in chans:
        others = [c for c in chans if c != ch]
        total = 0.0
        for k in range(3):
            for S in combinations(others, k):
                total += wts[len(S)] * (v(frozenset(S) | {ch})
                                        - v(frozenset(S)))
        phi[ch] = total
    for ch in chans:
        assert abs(rows[ch].phi_conversions - phi[ch]) < 5e-4
    # efficiency: shares sum to 1 over attributable conversions
    assert abs(sum(r.phi_share for r in rows.values()) - 1.0) < 1e-4
