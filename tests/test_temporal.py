"""Semantic guards for the temporal/keyness batch: circular stats vs
numpy trig, keyness vs a Counter G^2 replay, turning points vs a
sequential scan, and the DOW x hour grid vs a crosstab."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_circular_rayleigh_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.temporal import stats_circular_rayleigh
    row = stats_circular_rayleigh(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    s = (ev.loc[ev["event_type"] == "purchase", "ts"]
         .astype("datetime64[ns]").astype("int64") // 10 ** 9)
    th = 2 * np.pi * (s % 86400).to_numpy() / 86400.0
    c = sum(round(v * 1e6) for v in np.cos(th))
    sn = sum(round(v * 1e6) for v in np.sin(th))
    n = len(th)
    rbar = math.sqrt(c * c + sn * sn) / (n * 1e6)
    mh = math.atan2(sn, c)
    if mh < 0:
        mh += 2 * math.pi
    assert row.n == n
    assert row.r_bar == _r(rbar, 6)
    assert row.mean_hour == _r(mh / (2 * math.pi) * 24.0, 4)
    assert row.rayleigh_p == _r(math.exp(-n * _r(rbar, 6) ** 2), 8)
    assert 0.0 <= row.mean_hour < 24.0 and 0.0 <= row.r_bar <= 1.0


def test_keyness_counter_replay(spark, sf_dir):
    from excel_to_db_spark.queries.temporal import text_keyness_llr
    rows = text_keyness_llr(spark, sf_dir).collect()
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    a_cnt, b_cnt = Counter(), Counter()
    for src, t in zip(d["source"], d["text"]):
        (a_cnt if src == "src0" else b_cnt).update(t.split(" "))
    ta, tb = sum(a_cnt.values()), sum(b_cnt.values())
    scored = []
    for w in set(a_cnt) | set(b_cnt):
        a, b = a_cnt.get(w, 0), b_cnt.get(w, 0)
        g2 = 0.0
        if a > 0:
            g2 += a * math.log(a * (ta + tb) / ((a + b) * ta))
        if b > 0:
            g2 += b * math.log(b * (ta + tb) / ((a + b) * tb))
        scored.append((-round(2.0 * g2 * 1e6), w, a, b))
    scored.sort()
    assert len(rows) == 10
    for got, (neg_g2u, w, a, b) in zip(rows, scored[:10]):
        assert (got.word, got.n_target, got.n_rest) == (w, a, b)
        direction = 1 if a * tb > b * ta else -1
        assert got.signed_g2 == _r(direction * (-neg_g2u) / 1e6, 6)
    # the table is sorted by |G2| descending
    mags = [abs(r.signed_g2) for r in rows]
    assert all(x >= y for x, y in zip(mags, mags[1:]))


def test_turning_points_sequential_scan(spark, sf_dir):
    from excel_to_db_spark.queries.temporal import ts_turning_points
    row = ts_turning_points(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    y = (pd.DataFrame({"d": o["o_orderdate"].dt.floor("D"),
                       "c": cents})
         .groupby("d")["c"].sum().sort_index().to_numpy())
    t = sum(1 for i in range(1, len(y) - 1)
            if (y[i] > y[i - 1] and y[i] > y[i + 1])
            or (y[i] < y[i - 1] and y[i] < y[i + 1]))
    n = len(y)
    assert (row.n, row.n_turning_points) == (n, t)
    assert row.expected_tp == _r(2.0 * (n - 2) / 3.0, 4)
    z = (t - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert row.z == _r(z, 5)


def test_dow_hour_grid_crosstab(spark, sf_dir):
    from excel_to_db_spark.queries.temporal import events_dow_hour_profile
    rows = {(r.dow, r.hr): r
            for r in events_dow_hour_profile(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    dow = ((ev["ts"].dt.floor("D")
            - pd.Timestamp("1995-01-02")).dt.days.mod(7))
    hr = ev["ts"].dt.hour
    cnt = Counter(zip(dow, hr))
    total = sum(cnt.values())
    assert len(rows) == len(cnt)
    for (d, h), n in cnt.items():
        r = rows[(d, h)]
        assert r.n == n
        assert r.share == _r(n / total, 8)
        assert r.lift == _r(n * len(cnt) / total, 4)
    # lifts average to ~1 by construction
    assert abs(np.mean([r.lift for r in rows.values()]) - 1.0) < 0.01
