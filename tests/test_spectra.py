"""Semantic guards for the spectrum/tree/persistence batch: variance
spectrum vs numpy, depth-2 CART vs a greedy python replay, AR(1)
half-life algebra, and rich-club vs adjacency counting."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_variance_spectrum_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.spectra import (
        embedding_variance_spectrum)
    row = embedding_variance_spectrum(spark, sf_dir).collect()[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.round(np.stack(emb["embedding"].to_numpy())
                 .astype("float64") * 1e6) / 1e6
    lam = np.round(V.var(axis=0) * 1e12) / 1e12
    pr = float(lam.sum() ** 2 / (lam ** 2).sum())
    assert (row.n, row.d) == (len(V), V.shape[1])
    assert abs(row.total_var - lam.sum()) < 1e-4
    assert abs(row.top_var - lam.max()) < 1e-4
    assert abs(row.participation_ratio - pr) < 1e-2
    assert 1.0 <= row.participation_ratio <= row.d


def test_tree_depth2_greedy_replay(spark, sf_dir):
    from excel_to_db_spark.queries.spectra import ml_tree_depth2
    row = ml_tree_depth2(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["purchase", "view"])]
    b = (np.floor(ev["value"] * 100 + 0.5).astype("int64") // 1000)
    y = (ev["event_type"] == "purchase").astype(int)
    hist = (pd.DataFrame({"b": b, "y": y})
            .groupby("b")["y"].agg(["size", "sum"])
            .rename(columns={"size": "cnt", "sum": "pos"})
            .sort_index())

    def best(h):
        ct, pt = int(h["cnt"].sum()), int(h["pos"].sum())
        cl = pl = 0
        cand = []
        for thr, rec in h.iterrows():
            cl += int(rec["cnt"])
            pl += int(rec["pos"])
            if cl < ct:
                score = pl * pl / cl + (pt - pl) ** 2 / (ct - cl)
                cand.append((-score, thr))
        return min(cand)[1]

    root = best(hist)
    lthr = best(hist[hist.index <= root])
    rthr = best(hist[hist.index > root])
    assert (row.root_thr, row.left_thr, row.right_thr) == \
        (root, lthr, rthr)
    # leaf-majority accuracy beats the base rate
    base = max(y.mean(), 1 - y.mean())
    assert row.train_accuracy >= base - 1e-9


def test_halflife_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.spectra import ts_halflife
    row = ts_halflife(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": o["o_orderdate"].dt.floor("D"),
                           "c": cents})
             .groupby("d")["c"].sum().sort_index()
             .to_numpy(dtype="float64"))
    x, y = daily[:-1], daily[1:]
    rho = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
    assert row.n == len(x)
    assert row.rho == _r(rho, 6)
    if 0 < row.rho < 1:
        assert row.halflife_days == _r(-math.log(2) / math.log(row.rho),
                                       2)
    else:
        assert row.halflife_days is None


def test_rich_club_adjacency_counting(spark, sf_dir):
    from excel_to_db_spark.queries.spectra import graph_rich_club
    rows = {r.k: r for r in graph_rich_club(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["c_nationkey"] != j["s_nationkey"]]
    j["cents"] = np.floor(j["l_extendedprice"] * 100 + 0.5)\
        .astype("int64")
    w = (j.groupby(["c_nationkey", "s_nationkey"])["cents"].sum()
         .reset_index())
    w = w.sort_values(["c_nationkey", "cents", "s_nationkey"],
                      ascending=[True, False, True])
    top = w.groupby("c_nationkey").head(3)
    edges = {(min(u, v), max(u, v))
             for u, v in zip(top["c_nationkey"], top["s_nationkey"])}
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for k in (3, 5, 7):
        richset = {n for n, d in deg.items() if d > k}
        er = sum(1 for a, b in edges
                 if a in richset and b in richset)
        rr = rows[k]
        assert (rr.n_rich, rr.e_rich) == (len(richset), er)
        if len(richset) >= 2:
            assert rr.phi == _r(2.0 * er / (len(richset)
                                            * (len(richset) - 1)), 6)
        else:
            assert rr.phi is None
