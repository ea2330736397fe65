"""Semantic guards for the unicity/smoothing/stickiness/entropy
batch: unicity vs a pandas QI census, kernel regression vs explicit
triangular weights, DAU Jaccard vs set algebra, and the entropy
curve's information monotonicity."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_unicity_pandas_qi_census(spark, sf_dir):
    from excel_to_db_spark.queries.finalpanel import privacy_unicity
    row = privacy_unicity(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    bits = {"click": 1, "view": 2, "purchase": 4, "signup": 8,
            "error": 16}
    cells = Counter()
    for uid, grp in ev.groupby("user_id"):
        mask = sum(bits[t] for t in set(grp["event_type"]))
        first = grp["ts"].min()
        dow = (first.floor("D") - pd.Timestamp("1995-01-02")).days % 7
        cells[(mask, dow, first.hour)] += 1
    n_users = sum(cells.values())
    n_unique = sum(1 for v in cells.values() if v == 1)
    small = sum(v for v in cells.values() if v <= 5)
    assert (row.n_users, row.n_cells) == (n_users, len(cells))
    assert row.n_unique == n_unique
    assert row.unicity == _r(n_unique / n_users, 6)
    assert row.share_k_le_5 == _r(small / n_users, 6)
    assert 0.0 <= row.unicity <= 1.0


def test_kernel_regression_triangular_weights(spark, sf_dir):
    from excel_to_db_spark.queries.finalpanel import ml_kernel_regression
    rows = {r.bin: r
            for r in ml_kernel_regression(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["purchase", "view"])]
    b = np.floor(ev["value"] * 100 + 0.5).astype("int64") // 1000
    y = (ev["event_type"] == "purchase").astype(int)
    hist = (pd.DataFrame({"b": b, "y": y})
            .groupby("b")["y"].agg(["size", "sum"]))
    for g, r in rows.items():
        wpos = wcnt = 0
        for bb, rec in hist.iterrows():
            dist = abs(g - bb)
            if dist <= 3:
                w = 4 - dist
                wpos += w * int(rec["sum"])
                wcnt += w * int(rec["size"])
        assert r.n_raw == int(hist.loc[g, "size"])
        assert r.rate_raw == _r(int(hist.loc[g, "sum"])
                                / int(hist.loc[g, "size"]), 6)
        assert r.rate_smooth == _r(wpos / wcnt, 6)
    # smoothing shrinks the cross-bin variance of the rate profile
    raw = np.array([r.rate_raw for r in rows.values()])
    sm = np.array([r.rate_smooth for r in rows.values()])
    assert sm.var() <= raw.var() + 1e-12


def test_dau_stickiness_set_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.finalpanel import events_dau_stickiness
    rows = {r.day: r
            for r in events_dau_stickiness(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    ev["d"] = ev["ts"].dt.floor("D")
    active = {d: set(g["user_id"]) for d, g in ev.groupby("d")}
    days = sorted(active)
    assert len(rows) == len(days) - 1
    for d, dn in zip(days, days[1:]):
        inter = len(active[d] & active[dn])
        uni = len(active[d] | active[dn])
        r = rows[d]
        assert (r.dau, r.overlap_next) == (len(active[d]), inter)
        assert r.jaccard_next == _r(inter / uni, 6)
        assert 0.0 <= r.jaccard_next <= 1.0


def test_entropy_curve_monotonicity(spark, sf_dir):
    from excel_to_db_spark.queries.finalpanel import (
        text_entropy_ngram_curve)
    row = text_entropy_ngram_curve(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["text"])
    u, pair, tri = Counter(), Counter(), Counter()
    for t in d["text"]:
        w = t.split(" ")
        for i in range(len(w) - 2):
            u[w[i]] += 1
            pair[(w[i], w[i + 1])] += 1
            tri[(w[i], w[i + 1], w[i + 2])] += 1

    def h(cnt):
        tot = sum(cnt.values())
        return sum(round(-(c / tot) * math.log2(c / tot) * 1e9)
                   for c in cnt.values()) / 1e9

    h1, h2, h3 = h(u), h(pair), h(tri)
    assert row.h1_bits == _r(h1, 6)
    assert row.h2_cond_bits == _r(h2 - h1, 6)
    assert row.h3_cond_bits == _r(h3 - h2, 6)
    # information can't hurt: conditioning lowers entropy
    assert row.h1_bits >= row.h2_cond_bits >= row.h3_cond_bits > 0
