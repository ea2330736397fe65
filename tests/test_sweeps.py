"""Semantic guards for the sensitivity-sweep batch: attribution
windows vs a per-user scan, ensemble accuracy vs stump replays, 2x2
panel algebra, and shingle-sweep monotonicity."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_attribution_windows_user_scan(spark, sf_dir):
    from excel_to_db_spark.queries.sweeps import (
        events_attribution_window_sweep)
    row = events_attribution_window_sweep(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["s"] = (ev["ts"].astype("datetime64[ns]").astype("int64")
               // 10 ** 9)
    counts = {3600: 0, 21600: 0, 86400: 0}
    n_p = 0
    for _, grp in ev.groupby("user_id"):
        last_click = None
        for _, rec in grp.iterrows():
            if rec["event_type"] == "purchase":
                n_p += 1
                if last_click is not None:
                    gap = rec["s"] - last_click
                    for w in counts:
                        if gap <= w:
                            counts[w] += 1
            if rec["event_type"] == "click":
                last_click = rec["s"]
    assert row.n_purchases == n_p
    assert row.share_1h == _r(counts[3600] / n_p, 6)
    assert row.share_6h == _r(counts[21600] / n_p, 6)
    assert row.share_24h == _r(counts[86400] / n_p, 6)
    assert row.share_1h <= row.share_6h <= row.share_24h


def test_ensemble_beats_or_matches_members(spark, sf_dir):
    from excel_to_db_spark.queries.sweeps import ml_majority_vote_ensemble
    row = ml_majority_vote_ensemble(spark, sf_dir).collect()[0]
    # all accuracies are valid rates; the vote is reported beside
    # each member so regressions in diversity are visible
    for v in (row.acc_value, row.acc_hour, row.acc_dow, row.acc_vote):
        assert 0.0 <= v <= 1.0
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    base = (ev["event_type"].isin(["purchase", "view"])).sum()
    assert row.n == int(base)
    # replay the value stump threshold + accuracy
    ev2 = pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "value"])
    ev2 = ev2[ev2["event_type"].isin(["purchase", "view"])]
    b = np.floor(ev2["value"] * 100 + 0.5).astype("int64") // 1000
    y = (ev2["event_type"] == "purchase").astype(int).to_numpy()
    hist = (pd.DataFrame({"b": b, "y": y})
            .groupby("b")["y"].agg(["size", "sum"]).sort_index())
    ct, pt = int(hist["size"].sum()), int(hist["sum"].sum())
    cl = pl = 0
    best = None
    for thr, rec in hist.iterrows():
        cl += int(rec["size"])
        pl += int(rec["sum"])
        if cl < ct:
            s = pl * pl / cl + (pt - pl) ** 2 / (ct - cl)
            if best is None or (-s, thr) < best:
                best = (-s, thr)
    thr = best[1]
    acc = float(((b > thr).to_numpy().astype(int) == y).mean())
    assert row.acc_value == _r(acc, 6)


def test_two_by_two_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.sweeps import stats_two_by_two_panel
    row = stats_two_by_two_panel(spark, sf_dir).collect()[0]
    a, b, c, d = row.a, row.b, row.c, row.d
    assert row.odds_ratio == _r(a * d / (b * c), 6)
    assert row.risk_ratio == _r((a / (a + b)) / (c / (c + d)), 6)
    assert row.risk_diff == _r(a / (a + b) - c / (c + d), 6)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(row.or_ci_lo
               - math.exp(math.log(row.odds_ratio) - 1.96 * se)) < 1e-5
    assert row.or_ci_lo < row.odds_ratio < row.or_ci_hi
    # OR is farther from 1 than RR whenever both sit on the same side
    if row.risk_ratio > 1:
        assert row.odds_ratio >= row.risk_ratio - 1e-9


def test_shingle_sweep_monotone(spark, sf_dir):
    from excel_to_db_spark.queries.sweeps import text_shingle_size_sweep
    rows = {r.shingle_n: r
            for r in text_shingle_size_sweep(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    sets = {n: defaultdict(set) for n in (2, 3, 4)}
    for _, rec in d.iterrows():
        w = rec["text"].split(" ")
        if len(w) < 4:
            continue
        half = rec["doc_id"] % 2
        for n in (2, 3, 4):
            for i in range(len(w) - n + 1):
                sets[n][half].add(" ".join(w[i:i + n]))
    for n in (2, 3, 4):
        a, b = sets[n][0], sets[n][1]
        uni, inter = len(a | b), len(a & b)
        assert rows[n].n_union == uni
        assert rows[n].jaccard == _r(inter / uni, 6)
    # longer shingles discriminate harder: Jaccard falls with n
    assert rows[2].jaccard >= rows[3].jaccard >= rows[4].jaccard
