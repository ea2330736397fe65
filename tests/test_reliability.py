"""Semantic guards for the reliability/concordance batch: Kendall's W
vs a pandas rank replay, Cronbach's alpha vs direct variances, ICC vs
the ANOVA decomposition, and rank-sum AUC vs a brute-force pairwise
count on a sample."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_kendall_w_pandas_rank_replay(spark, sf_dir):
    from excel_to_db_spark.queries.reliability import stats_kendall_w
    row = stats_kendall_w(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype("int64")
    j["judge"] = j["o_orderdate"].dt.year
    rev = (j.groupby(["judge", "c_nationkey"])["cents"].sum()
           .reset_index().rename(columns={"c_nationkey": "item"}))
    m = rev["judge"].nunique()
    common = rev.groupby("item").size()
    common = set(common[common == m].index)
    rev = rev[rev["item"].isin(common)]
    # unique ranks: cents DESC, item ASC
    rev = rev.sort_values(["judge", "cents", "item"],
                          ascending=[True, False, True])
    rev["rk"] = rev.groupby("judge").cumcount() + 1
    rs = rev.groupby("item")["rk"].sum()
    n = len(rs)
    s4 = int(((2 * rs - m * (n + 1)) ** 2).sum())
    w = 3.0 * s4 / (float(m) * m * (float(n) * n * n - n))
    assert (row.n_items, row.m_judges) == (n, m)
    assert row.w == _r(w, 6)
    assert 0.0 <= row.w <= 1.0
    assert row.chi2 == _r(float(m) * (n - 1) * w, 4)


def test_cronbach_alpha_direct_variance(spark, sf_dir):
    from excel_to_db_spark.queries.reliability import stats_cronbach_alpha
    row = stats_cronbach_alpha(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    piv = (ev.groupby(["user_id", "event_type"]).size()
           .unstack(fill_value=0)
           .reindex(columns=["click", "view", "purchase", "signup",
                             "error"], fill_value=0))
    item_var = piv.var(ddof=0).sum()       # population variances
    tot_var = piv.sum(axis=1).var(ddof=0)
    alpha = (5.0 / 4.0) * (1.0 - item_var / tot_var)
    assert row.n == len(piv) and row.k_items == 5
    assert abs(row.alpha - alpha) < 1e-5


def test_icc_anova_decomposition(spark, sf_dir):
    from excel_to_db_spark.queries.reliability import stats_icc
    row = stats_icc(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["rn"] = ev.groupby("user_id").cumcount() + 1
    first4 = ev[ev["rn"] <= 4]
    sizes = first4.groupby("user_id").size()
    keep = set(sizes[sizes == 4].index)
    first4 = first4[first4["user_id"].isin(keep)]
    g = first4.groupby("user_id")["c"]
    gm = g.mean()
    grand = first4["c"].mean()
    G, k = len(gm), 4
    ssb = float(k * ((gm - grand) ** 2).sum())
    ssw = float(((first4["c"] - first4["user_id"].map(gm)) ** 2).sum())
    msb, msw = ssb / (G - 1), ssw / (G * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert (row.n_groups, row.k_reps) == (G, 4)
    assert abs(row.icc1 - icc) < 1e-5


def test_auc_rank_brute_force_sample(spark, sf_dir):
    from excel_to_db_spark.queries.reliability import eval_auc_rank
    row = eval_auc_rank(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["purchase", "view"])]
    c = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    pos = c[ev["event_type"] == "purchase"].to_numpy()
    neg = c[ev["event_type"] == "view"].to_numpy()
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    # midrank AUC replay via scipy-free average ranks
    ranks = pd.Series(np.concatenate([pos, neg])) \
        .rank(method="average").to_numpy()
    rp = ranks[:len(pos)].sum()
    auc = (rp - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * len(neg))
    assert row.auc == _r(auc, 6)
    assert 0.0 <= row.auc <= 1.0
    # the brute-force pairwise definition agrees on a bounded sample
    ps, ns = pos[:300], neg[:300]
    wins = (ps[:, None] > ns[None, :]).sum() \
        + 0.5 * (ps[:, None] == ns[None, :]).sum()
    assert abs(wins / (len(ps) * len(ns))
               - auc) < 0.1    # same statistic, sampled arms
