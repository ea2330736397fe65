"""Semantic guards for the stylometry/trend/reliability batch:
Burrows' Delta vs a Counter z-score replay, Page's L vs a rank loop,
the Weibull Menon algebra, and Heaps' law vs prefix set growth."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_burrows_delta_counter_replay(spark, sf_dir):
    from excel_to_db_spark.queries.stylo import text_burrows_delta
    rows = {r.source_b: r
            for r in text_burrows_delta(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    per_src = defaultdict(Counter)
    total = Counter()
    for src, t in zip(d["source"], d["text"]):
        ws = t.split(" ")
        per_src[src].update(ws)
        total.update(ws)
    top10 = [w for w, _ in sorted(total.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:10]]
    ppm = {(s, w): round(c[w] * 1e6 / sum(c.values()))
           for s, c in per_src.items() for w in top10 if c[w] > 0}
    zfinal = {}
    for w in top10:
        vals = [v for (s, ww), v in ppm.items() if ww == w]
        k = len(vals)
        mu = sum(vals) / k
        sd = math.sqrt(k * sum(v * v for v in vals)
                       - sum(vals) ** 2) / k
        for s in per_src:
            if (s, w) in ppm:
                zfinal[(s, w)] = round((ppm[(s, w)] - mu) / sd * 1e6)
    deltas = {}
    for s in per_src:
        if s == "src0":
            continue
        common = [w for w in top10
                  if ("src0", w) in zfinal and (s, w) in zfinal]
        du = sum(abs(zfinal[("src0", w)] - zfinal[(s, w)])
                 for w in common)
        deltas[s] = (len(common), du)
    for s, (nw, du) in deltas.items():
        assert rows[s].n_words == nw
        assert rows[s].burrows_delta == _r(du / (nw * 1e6), 6)
    assert len(rows) == len(deltas)


def test_page_trend_rank_loop(spark, sf_dir):
    from excel_to_db_spark.queries.stylo import stats_page_trend
    row = stats_page_trend(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    week = np.minimum(
        3, (ev["ts"].dt.floor("D")
            - pd.Timestamp("2024-01-01")).dt.days // 7)
    cnt = (pd.DataFrame({"u": ev["user_id"], "w": week})
           .groupby(["u", "w"]).size().reset_index(name="c"))
    full = cnt.groupby("u").size()
    keep = set(full[full == 4].index)
    cnt = cnt[cnt["u"].isin(keep)]
    l_stat = 0
    for u, grp in cnt.groupby("u"):
        order = sorted(zip(grp["c"], grp["w"]))
        for rank, (_, w) in enumerate(order, start=1):
            l_stat += (w + 1) * rank
    n = len(keep)
    assert (row.n, row.l_stat) == (n, l_stat)
    el = n * 4 * 25 / 4.0
    vl = n * 16 * 5 * 15 / 144.0
    assert row.l_expected == _r(el, 1)
    assert row.z == _r((l_stat - el) / math.sqrt(vl), 5)


def test_weibull_menon_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.stylo import stats_weibull_fit
    row = stats_weibull_fit(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_id", "event_type"])
    ev = ev[ev["event_type"] == "purchase"]\
        .sort_values(["ts", "event_id"])
    s = (ev["ts"].astype("datetime64[ns]").astype("int64")
         // 10 ** 9).to_numpy()
    gaps = np.diff(s)
    gaps = gaps[gaps > 0]
    lu = np.array([round(math.log(g) * 1e6) for g in gaps])
    n = len(lu)
    sd = math.sqrt((n * float((lu.astype("float64") ** 2).sum())
                    - float(lu.sum()) ** 2)) / n / 1e6
    k = math.pi / (sd * math.sqrt(6.0))
    mean_ln = float(lu.sum()) / n / 1e6
    scale = math.exp(mean_ln + 0.5772156649015329 / k)
    assert row.n == n
    assert row.shape_k == _r(k, 4)
    assert abs(row.scale_s - scale) < max(0.02, 1e-5 * scale)
    want = ("bursty" if row.shape_k < 1.0 else
            "regular" if row.shape_k > 1.0 else "poisson")
    assert row.arrival_regime == want


def test_heaps_prefix_growth(spark, sf_dir):
    from excel_to_db_spark.queries.stylo import text_heaps_law
    row = text_heaps_law(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"]).sort_values("doc_id")
    d = d[d["text"].str.split(" ").str.len() >= 3]
    seen = set()
    toks = 0
    pts = []
    nd = len(d)
    cuts = {(cp * nd + 9) // 10: cp for cp in range(1, 11)}
    for i, t in enumerate(d["text"], start=1):
        w = t.split(" ")
        toks += len(w) - 2
        for j in range(len(w) - 2):
            seen.add(f"{w[j]} {w[j+1]} {w[j+2]}")
        if i in cuts:
            pts.append((toks, len(seen)))
    lx = np.array([round(math.log(x) * 1e6) for x, _ in pts],
                  dtype="float64")
    ly = np.array([round(math.log(v) * 1e6) for _, v in pts],
                  dtype="float64")
    m = len(lx)
    beta = ((m * (lx * ly).sum() - lx.sum() * ly.sum())
            / (m * (lx * lx).sum() - lx.sum() ** 2))
    kk = math.exp((ly.sum() / m - beta * lx.sum() / m) / 1e6)
    assert row.vocab_full == len(seen)
    assert abs(row.heaps_beta - beta) < 1e-3
    assert abs(row.heaps_k - kk) < max(0.05, 1e-3 * kk)
    assert 0.0 < row.heaps_beta <= 1.0
