"""Semantic guards for the nonparametric/stratified/ROC batch: KW via
an independent midrank replay, CMH from per-stratum 2x2 replays, the
Youden sweep vs a brute-force threshold scan, and the streaming OHLC
twin against the batch candle key."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_kruskal_wallis_midrank_replay(spark, sf_dir):
    from excel_to_db_spark.queries.stats_np import stats_kruskal_wallis
    row = stats_kruskal_wallis(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    c = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    grp = ev["event_type"]
    n = len(ev)
    assert (row.k_groups, row.n) == (grp.nunique(), n)
    vals, cnts = np.unique(c, return_counts=True)
    lt = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    mid2 = {v: 2 * int(l) + int(k) + 1
            for v, l, k in zip(vals, lt, cnts)}
    dev_u = 0
    for g in sorted(grp.unique()):
        cg = c[grp == g]
        r2 = sum(mid2[v] for v in cg)
        n_g = len(cg)
        dev = r2 * 0.5 / n_g - (n + 1) * 0.5
        dev_u += int(np.sign(dev * dev * n_g)
                     * math.floor(abs(n_g * dev * dev * 100) + 0.5))
    h_raw = _r((12.0 / (n * (n + 1))) * (dev_u / 100.0), 6)
    tsum = int((cnts.astype("int64") ** 3 - cnts).sum())
    tie_c = _r(1.0 - tsum / (n ** 3 - n), 6)
    assert row.h_raw == h_raw
    assert row.tie_c == tie_c
    assert row.h_stat == _r(h_raw / tie_c, 6)
    assert 0.0 <= row.p_value <= 1.0


def test_cmh_per_stratum_replay(spark, sf_dir):
    from excel_to_db_spark.queries.stats_np import stats_cmh_test
    row = stats_cmh_test(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_orderstatus"])
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    m = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    m["x"] = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    m["y"] = (m["o_orderstatus"] == "F").astype(int)
    sum_a = e_u = v_u = ad_u = bc_u = 0
    strata = m["c_nationkey"].unique()
    for s in strata:
        g = m[m["c_nationkey"] == s]
        a = int((g["x"] & g["y"]).sum())
        b = int((g["x"] & (1 - g["y"])).sum())
        cc = int(((1 - g["x"]) & g["y"]).sum())
        d = int(((1 - g["x"]) & (1 - g["y"])).sum())
        nn = len(g)
        sum_a += a
        e_u += math.floor((a + b) * (a + cc) / nn * 1e6 + 0.5)
        v_u += math.floor((a + b) * (cc + d) * (a + cc) * (b + d)
                          / (nn * nn * (nn - 1)) * 1e6 + 0.5)
        ad_u += math.floor(a * d / nn * 1e6 + 0.5)
        bc_u += math.floor(b * cc / nn * 1e6 + 0.5)
    assert (row.n_strata, row.sum_a) == (len(strata), sum_a)
    assert row.e_sum == _r(e_u / 1e6, 6)
    assert row.v_sum == _r(v_u / 1e6, 6)
    dev = abs(sum_a - e_u / 1e6) - 0.5
    assert row.cmh_chi2 == _r(dev * dev / (v_u / 1e6), 6)
    assert row.or_mh == _r(ad_u / bc_u, 6)
    assert 0.0 <= row.p_value <= 1.0


def test_youden_sweep_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.stats_np import eval_youden_threshold
    rows = eval_youden_threshold(spark, sf_dir).collect()
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["n_chars", "lang"])
    pos = (d["lang"] == "en").astype(int)
    p_all, n_all = int(pos.sum()), len(d)
    best_seen = 0
    for r in rows:
        tp = int(pos[d["n_chars"] >= r.threshold].sum())
        fp = int((1 - pos)[d["n_chars"] >= r.threshold].sum())
        assert (r.tp, r.fp) == (tp, fp)
        assert r.tpr == _r(tp / p_all, 6)
        assert r.fpr == _r(fp / (n_all - p_all), 6)
        assert r.j == _r(tp / p_all - fp / (n_all - p_all), 6) + 0.0
        best_seen += int(r.best)
    assert best_seen == 1
    mx = max(r.j for r in rows)
    flagged = [r for r in rows if r.best][0]
    assert flagged.j == mx
    assert flagged.threshold == min(r.threshold for r in rows
                                    if r.j == mx)
    assert len(rows) == d["n_chars"].nunique()


def test_stream_ohlc_equals_batch(spark, sf_dir):
    from excel_to_db_spark.queries.stats_np import stream_ohlc_candles
    from excel_to_db_spark.queries.warehouse6 import ts_ohlc_candles
    got = [tuple(r) for r in stream_ohlc_candles(spark, sf_dir).collect()]
    want = [tuple(r) for r in ts_ohlc_candles(spark, sf_dir).collect()]
    assert got == want
