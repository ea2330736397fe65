"""Semantic guards for the overlap/risk/queueing/encoding batch:
ROUGE vs a Counter-based replay, VaR/CVaR vs a sorted-tail sweep,
Little's law identity and rates, and LOO target encoding algebra."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_rouge_matches_counter_replay(spark, sf_dir):
    from excel_to_db_spark.queries.textops2 import eval_rouge_n
    row = eval_rouge_n(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    txt = dict(zip(d["doc_id"], d["text"]))
    r1_us, r2_us = [], []
    for ref_id in sorted(i for i in txt if i % 2 == 0
                         and i + 1 in txt):
        rt = txt[ref_id].split(" ")
        ht = txt[ref_id + 1].split(" ")
        c1r, c1h = Counter(rt), Counter(ht)
        ov1 = sum(min(c, c1h.get(g, 0)) for g, c in c1r.items())
        r1_us.append(round(ov1 * 1e6 / sum(c1r.values())))
        b_r = Counter(f"{a} {b}" for a, b in zip(rt, rt[1:]))
        b_h = Counter(f"{a} {b}" for a, b in zip(ht, ht[1:]))
        ov2 = sum(min(c, b_h.get(g, 0)) for g, c in b_r.items())
        r2_us.append(round(ov2 * 1e6 / sum(b_r.values())))
    assert row.n_pairs == len(r1_us)
    assert row.mean_rouge1 == _r(sum(r1_us) / (1e6 * len(r1_us)), 6)
    assert row.mean_rouge2 == _r(sum(r2_us) / (1e6 * len(r2_us)), 6)
    # bigram recall cannot exceed unigram recall on this corpus shape
    assert row.mean_rouge2 <= row.mean_rouge1


def test_var_cvar_sorted_tail(spark, sf_dir):
    from excel_to_db_spark.queries.textops2 import ts_var_cvar
    row = ts_var_cvar(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().sort_index())
    lr = [int(np.sign(x) * math.floor(abs(x) + 0.5)) for x in
          (np.log(daily.to_numpy()[1:] / daily.to_numpy()[:-1]) * 1e6)]
    n = len(lr)
    k = math.ceil(n * 0.05)
    assert (row.n, row.k_tail) == (n, k)
    srt = sorted(lr)
    assert row.var95 == _r(srt[k - 1] / 1e6, 6)
    assert row.cvar95 == _r(sum(srt[:k]) / (1e6 * k), 6)
    assert row.cvar95 <= row.var95  # the tail mean is at or below its edge
    worst = min(range(n), key=lambda i: (lr[i], i))
    assert row.worst_day == daily.index[worst + 1]


def test_littles_law_identity_and_rates(spark, sf_dir):
    from excel_to_db_spark.queries.textops2 import ops_littles_law
    row = ops_littles_law(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    d = (m["l_shipdate"] - m["o_orderdate"]).dt.days.astype("int64")
    t_days = int((m["l_shipdate"].max() - m["o_orderdate"].min()).days)
    assert (row.n_items, row.t_days) == (len(m), t_days)
    assert row.sum_days == int(d.sum())
    # the sweep integral must EQUAL the direct sum (the law's integral)
    assert row.identity_ok
    assert row.sweep_integral == row.sum_days
    assert row.lambda_per_day == _r(len(m) / t_days, 6)
    assert row.w_days == _r(int(d.sum()) / len(m), 6)
    assert row.l_avg == _r(int(d.sum()) / t_days, 6)
    # L = lambda * W up to the two roundings
    assert abs(row.l_avg - row.lambda_per_day * row.w_days) < 1e-3


def test_target_encoding_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.textops2 import ml_target_encoding
    rows = ml_target_encoding(spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    m["y"] = (m["l_returnflag"] == "R").astype(int)
    grp = m.groupby("p_brand")["y"].agg(["size", "sum"])
    for r in rows:
        n, s = int(grp.loc[r.brand, "size"]), int(grp.loc[r.brand, "sum"])
        assert (r.n, r.s) == (n, s)
        assert r.naive_enc == _r(s / n, 6)
        assert r.loo_enc_pos == _r((s - 1) / (n - 1), 6)
        assert r.loo_enc_neg == _r(s / (n - 1), 6)
        assert r.loo_var == _r(s * (n - s) / (n * (n - 1) ** 2), 8)
        # LOO mean over rows equals the naive mean (no-leakage identity)
        loo_mean = (s * (s - 1) / (n - 1) + (n - s) * s / (n - 1)) / n
        assert abs(loo_mean - s / n) < 1e-12
        # and the per-row LOO encodings genuinely differ by class
        if 0 < s < n:
            assert r.loo_enc_pos < r.loo_enc_neg
    assert len(rows) == grp.shape[0]
