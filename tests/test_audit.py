"""Semantic guards for the CI/burstiness/audit batch: median CI
coverage bracket from sorted values, burstiness vs a Counter replay,
the Simpson census from per-stratum cross-products, and the fairness
gaps from per-group confusion replays."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_median_ci_order_statistics(spark, sf_dir):
    from excel_to_db_spark.queries.audit import stats_median_ci
    row = stats_median_ci(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    c = np.sort(np.floor(ev["value"] * 100 + 0.5).astype("int64"))
    n = len(c)
    lo = math.floor(n / 2.0 - 0.98 * math.sqrt(n))
    hi = math.ceil(n / 2.0 + 0.98 * math.sqrt(n)) + 1
    assert (row.n, row.lo_rank, row.hi_rank) == (n, lo, hi)
    assert row.ci_low == _r(c[lo - 1] / 100.0, 2)
    assert row.ci_high == _r(c[hi - 1] / 100.0, 2)
    med_hi = c[n // 2] if n % 2 == 0 else c[(n - 1) // 2]
    assert row.median_upper == _r(med_hi / 100.0, 2)
    # the interval brackets the sample median
    assert row.ci_low <= row.median_upper <= row.ci_high


def test_burstiness_counter_replay(spark, sf_dir):
    from excel_to_db_spark.queries.audit import text_burstiness
    rows = {r.token: r for r in text_burstiness(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    cf, df = Counter(), Counter()
    for _, r in d.iterrows():
        toks = r["text"].split(" ")
        cf.update(toks)
        df.update(set(toks))
    docs = len(d)
    assert set(rows) == set(cf)
    for t in cf:
        r = rows[t]
        assert (r.cf, r.df) == (cf[t], df[t])
        assert r.burstiness == _r(cf[t] / df[t], 6)
        lam = cf[t] / docs
        want = _r(df[t] / (docs * (1.0 - math.exp(-lam))), 6)
        assert r.df_vs_poisson == want
        assert r.bursty == (want < 1.0)
        assert r.burstiness >= 1.0  # df <= cf always


def test_simpson_census_cross_products(spark, sf_dir):
    from excel_to_db_spark.queries.audit import stats_simpson_audit
    row = stats_simpson_audit(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority",
                                 "o_orderstatus"])
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    m = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    m["x"] = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    m["y"] = (m["o_orderstatus"] == "F").astype(int)

    def sign(g):
        a = int((g["x"] & g["y"]).sum())
        b = int((g["x"] & (1 - g["y"])).sum())
        c = int(((1 - g["x"]) & g["y"]).sum())
        d = int(((1 - g["x"]) & (1 - g["y"])).sum())
        return int(np.sign(a * d - b * c))

    p_sign = sign(m)
    signs = [sign(g) for _, g in m.groupby("c_nationkey")]
    assert row.n_strata == len(signs)
    assert row.pooled_sign == p_sign
    assert row.n_agree == sum(1 for s in signs if s == p_sign and s != 0)
    assert row.n_reversed == sum(1 for s in signs
                                 if s == -p_sign and s != 0)
    assert row.n_null == sum(1 for s in signs if s == 0)
    assert row.n_agree + row.n_reversed + row.n_null == row.n_strata


def test_fairness_gaps_per_group(spark, sf_dir):
    from excel_to_db_spark.queries.audit import eval_fairness_audit
    rows = {r.grp: r for r in eval_fairness_audit(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pred = (d["n_chars"] >= 300).astype(int)
    lab = (d["text"].str.count("e") >= 30).astype(int)
    sel, tprs, fprs = [], [], []
    for g in sorted(d["lang"].unique()):
        m = d["lang"] == g
        n = int(m.sum())
        n_sel = int(pred[m].sum())
        pos = int(lab[m].sum())
        tp = int((pred[m] & lab[m]).sum())
        fp = int((pred[m] & (1 - lab[m])).sum())
        r = rows[g]
        assert (r.n, r.n_sel) == (n, n_sel)
        assert r.sel_rate == _r(n_sel / n, 6)
        assert r.tpr == _r(tp / pos, 6)
        assert r.fpr == _r(fp / (n - pos), 6)
        sel.append(r.sel_rate)
        tprs.append(r.tpr)
        fprs.append(r.fpr)
    dp = _r(max(sel) - min(sel), 6)
    eo = _r(max(max(tprs) - min(tprs), max(fprs) - min(fprs)), 6)
    assert {r.dp_gap for r in rows.values()} == {dp}
    assert {r.eo_gap for r in rows.values()} == {eo}
    assert 0.0 <= dp <= 1.0 and 0.0 <= eo <= 1.0
