"""Semantic guards for the recsys/agreement/TS batch: i2i cosine
neighbors vs a pandas covisitation replay, Krippendorff's alpha from
vote counts, PACF vs a numpy Durbin-Levinson replay, and the compound
index's telescoping identity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_item_item_matches_covisitation_replay(spark, sf_dir):
    from excel_to_db_spark.queries.recsys_ts import recsys_item_item
    got = [(r.item, r.neighbor, r.co_count, r.cosine, r.rk)
           for r in recsys_item_item(spark, sf_dir).collect()]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    op = li.drop_duplicates()
    deg = op.groupby("l_partkey").size()
    co = {}
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                co[(ps[i], ps[j])] = co.get((ps[i], ps[j]), 0) + 1
    anchors = sorted(deg.index, key=lambda p: (-deg[p], p))[:20]
    want = []
    for a in sorted(anchors):
        neigh = []
        for (i, j), c in co.items():
            if i == a:
                neigh.append((j, c))
            elif j == a:
                neigh.append((i, c))
        scored = [(n, c, _r(c / (math.sqrt(deg[a]) * math.sqrt(deg[n])),
                            6)) for n, c in neigh]
        scored.sort(key=lambda t: (-t[2], t[0]))
        for rk, (n, c, cos) in enumerate(scored[:5], 1):
            want.append((a, n, c, cos, rk))
    assert got == want


def test_krippendorff_alpha_replay(spark, sf_dir):
    from excel_to_db_spark.queries.recsys_ts import eval_krippendorff_alpha
    row = eval_krippendorff_alpha(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    k = ((d["n_chars"] >= 300).astype(int)
         + (d["text"].str.count("e") >= 30).astype(int)
         + d["text"].str.contains(" the ", regex=False).astype(int))
    n = len(d)
    dis = int((2 * k * (3 - k)).sum())
    p1 = int(k.sum())
    assert (row.n, row.p_ones, row.p_zeros) == (n, p1, 3 * n - p1)
    assert row.dis_pairs == dis
    d_obs = dis / (n * 3 * 2)
    d_exp = 2.0 * p1 * (3 * n - p1) / ((3.0 * n) * (3 * n - 1))
    assert row.d_obs == _r(d_obs, 6)
    assert row.d_exp == _r(d_exp, 6)
    assert row.alpha == _r(1.0 - d_obs / d_exp, 6)
    assert row.alpha <= 1.0


def test_pacf_matches_durbin_levinson(spark, sf_dir):
    from excel_to_db_spark.queries.recsys_ts import ts_pacf
    got = {r.lag: r.pacf for r in ts_pacf(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    x = (ev["ts"].dt.floor("D").value_counts().sort_index()
         .astype("int64"))
    days = x.index
    mu = x.sum() / len(x)
    g = {}
    for k in range(4):
        shifted = x.reindex(days + pd.Timedelta(days=k))
        mask = ~shifted.isna().to_numpy()
        prod = ((x.to_numpy()[mask] - mu)
                * (shifted.to_numpy()[mask] - mu))
        g[k] = int(np.floor(np.abs(prod * 1e4) + 0.5)
                   .astype("int64").dot(np.sign(prod).astype("int64")))
    r1 = _r(g[1] / g[0], 8)
    r2 = _r(g[2] / g[0], 8)
    r3 = _r(g[3] / g[0], 8)
    phi11 = _r(r1, 6)
    phi22 = _r((r2 - r1 * r1) / (1.0 - r1 * r1), 6)
    phi21 = _r(r1 - phi22 * r1, 6)
    phi33 = _r((r3 - phi21 * r2 - phi22 * r1)
               / (1.0 - phi21 * r1 - phi22 * r2), 6)
    assert got == {1: phi11, 2: phi22, 3: phi33}


def test_compound_index_telescopes(spark, sf_dir):
    from excel_to_db_spark.queries.recsys_ts import ts_compound_index
    rows = sorted(ts_compound_index(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    assert rows[0].log_ret_micro == 0
    assert rows[0].index_100 == 100.0
    # telescoping: exp(sum of log returns) ~ last/first (micro-snap
    # error <= n_days * 0.5e-6 in log space)
    want = 100.0 * rows[-1].cents / rows[0].cents
    assert abs(rows[-1].index_100 - want) / want < len(rows) * 1e-6
    # replay one middle row exactly
    mid = len(rows) // 2
    acc = sum(r.log_ret_micro for r in rows[:mid + 1])
    assert rows[mid].index_100 == _r(math.exp(acc / 1e6) * 100.0, 4)
