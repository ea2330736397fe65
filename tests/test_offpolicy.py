"""Semantic guards for the off-policy/recsys/ops batch: IPS/SNIPS vs
a per-row reweighting replay, bandit replay vs direct filtering,
catalog coverage vs pandas top-k, and Apdex count algebra."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_SEG = {0: "click", 1: "view", 2: "purchase", 3: "signup"}


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _log(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])
    ev["r"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev["pi"] = (ev["user_id"] % 4).map(_SEG)
    return ev


def test_ips_snips_per_row_replay(spark, sf_dir):
    from excel_to_db_spark.queries.offpolicy import eval_ips_snips
    row = eval_ips_snips(spark, sf_dir).collect()[0]
    ev = _log(sf_dir)
    n = len(ev)
    p = ev["event_type"].value_counts() / n
    hit = ev["event_type"] == ev["pi"]
    w = hit / ev["event_type"].map(p)
    ips = float((ev["r"] * w).sum() / n) / 100.0
    snips = float((ev["r"] * w).sum() / w.sum()) / 100.0
    ess = float(w.sum() ** 2 / (w ** 2).sum())
    assert row.n == n
    assert abs(row.ips_value - ips) < 5e-3
    assert abs(row.snips_value - snips) < 5e-3
    assert abs(row.ess - ess) / ess < 1e-3
    assert row.ess <= n          # reweighting can only lose samples


def test_bandit_replay_direct_filter(spark, sf_dir):
    from excel_to_db_spark.queries.offpolicy import eval_bandit_replay
    rows = {r.policy: r
            for r in eval_bandit_replay(spark, sf_dir).collect()}
    ev = _log(sf_dir)
    seg = ev[ev["event_type"] == ev["pi"]]
    clk = ev[ev["event_type"] == "click"]
    assert rows["segment_router"].n_matched == len(seg)
    assert rows["always_click"].n_matched == len(clk)
    assert rows["segment_router"].match_rate == _r(
        len(seg) / len(ev), 6)
    assert rows["always_click"].replay_value == _r(
        clk["r"].mean() / 100.0, 4)
    assert rows["segment_router"].replay_value == _r(
        seg["r"].mean() / 100.0, 4)


def test_catalog_coverage_pandas_topk(spark, sf_dir):
    from excel_to_db_spark.queries.offpolicy import recsys_catalog_coverage
    row = recsys_catalog_coverage(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_extendedprice"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["cents"] = np.floor(j["l_extendedprice"] * 100 + 0.5)\
        .astype("int64")
    spend = (j.groupby(["o_custkey", "l_partkey"])["cents"].sum()
             .reset_index())
    spend = spend.sort_values(["o_custkey", "cents", "l_partkey"],
                              ascending=[True, False, True])
    recs = spend.groupby("o_custkey").head(3)
    pop = li.groupby("l_partkey").size()
    total = int(pop.sum())
    nov_terms = [round(-math.log2(pop[p] / total) * 1e6)
                 for p in recs["l_partkey"]]
    assert row.n_users == recs["o_custkey"].nunique()
    assert row.n_recs == len(recs)
    assert row.n_covered == recs["l_partkey"].nunique()
    assert row.coverage == _r(recs["l_partkey"].nunique()
                              / len(part), 6)
    assert row.novelty == _r(sum(nov_terms) / (len(recs) * 1e6), 4)
    assert 0.0 < row.coverage <= 1.0


def test_apdex_count_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.offpolicy import ops_apdex
    rows = ops_apdex(spark, sf_dir).collect()
    ev = _log(sf_dir)
    for r in rows:
        g = ev[ev["event_type"] == r.service]["r"]
        sat = int((g <= 5000).sum())
        tol = int(((g > 5000) & (g <= 20000)).sum())
        assert (r.n, r.satisfied, r.tolerating) == (len(g), sat, tol)
        assert r.apdex == _r((2 * sat + tol) / (2.0 * len(g)), 4)
        assert 0.0 <= r.apdex <= 1.0
    assert len(rows) == 5
