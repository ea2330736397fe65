"""Semantic guards for the information-theory batch: entropy rate vs
a transition-matrix replay (and the conditioning inequality), KL vs a
Counter-based recompute, RBO vs a set-sweep replay, and TVD/MI vs
direct contingency arithmetic."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _ri(x):
    return int(np.sign(x) * math.floor(abs(x) + 0.5))


def test_entropy_rate_transition_replay(spark, sf_dir):
    from excel_to_db_spark.queries.infotheory import events_entropy_rate
    row = events_entropy_rate(spark, sf_dir).collect()[0]
    ev = (pd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "ts", "event_id",
                                   "event_type"])
          .sort_values(["user_id", "ts", "event_id"]))
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] += 1
    n = sum(trans.values())
    ci = Counter()
    for (a, _), c in trans.items():
        ci[a] += c
    h_rate_u = sum(_ri(-(c / n) * math.log(c / ci[a]) * 1e9)
                   for (a, _), c in trans.items())
    h0_u = sum(_ri(-(c / n) * math.log(c / n) * 1e9)
               for c in ci.values())
    assert (row.n_transitions, row.n_cells) == (n, len(trans))
    assert row.n_states == len(ci)
    assert row.entropy_rate == _r(h_rate_u / 1e9, 6)
    assert row.marginal_entropy == _r(h0_u / 1e9, 6)
    # conditioning cannot increase entropy
    assert row.entropy_rate <= row.marginal_entropy + 1e-9
    assert row.predictability == _r(1.0 - (h_rate_u / 1e9)
                                    / (h0_u / 1e9), 6)


def test_kl_matrix_counter_replay(spark, sf_dir):
    from excel_to_db_spark.queries.infotheory import text_kl_matrix
    rows = {r.source: r for r in text_kl_matrix(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    corp = Counter()
    per = {}
    for _, r in d.iterrows():
        toks = r["text"].split(" ")
        corp.update(toks)
        per.setdefault(r["source"], Counter()).update(toks)
    v = len(corp)
    nc = sum(corp.values())
    for s, cnt in per.items():
        ns = sum(cnt.values())
        kf = kr = 0
        for t in corp:
            ps = (cnt.get(t, 0) + 1.0) / (ns + v)
            pc = (corp[t] + 1.0) / (nc + v)
            kf += _ri(ps * math.log(ps / pc) * 1e9)
            kr += _ri(pc * math.log(pc / ps) * 1e9)
        r = rows[s]
        assert r.n_tokens == ns
        assert r.kl_source_vs_corpus == _r(kf / 1e9, 6)
        assert r.kl_corpus_vs_source == _r(kr / 1e9, 6)
        assert r.kl_source_vs_corpus >= 0  # Gibbs' inequality
        assert r.kl_corpus_vs_source >= 0


def test_rbo_set_sweep(spark, sf_dir):
    from excel_to_db_spark.queries.infotheory import eval_rbo
    rows = sorted(eval_rbo(spark, sf_dir).collect(), key=lambda r: r.d)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])
    cents = np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")
    deg = (pd.DataFrame({"p": li["l_partkey"], "c": 1, "rev": cents})
           .groupby("p").agg(c=("c", "size"), rev=("rev", "sum")))
    la = sorted(deg.index, key=lambda p: (-deg.loc[p, "c"], p))[:20]
    lb = sorted(deg.index, key=lambda p: (-deg.loc[p, "rev"], p))[:20]
    term_us = []
    for r in rows:
        d = r.d
        ov = len(set(la[:d]) & set(lb[:d]))
        assert r.overlap == ov
        assert r.agreement == _r(ov / d, 6)
        term_us.append(_ri(0.9 ** (d - 1) * ov * 1e9 / d))
    want_rbo = _r(0.1 * sum(term_us) / 1e9, 6)
    assert {r.rbo_min for r in rows} == {want_rbo}
    assert 0.0 <= want_rbo <= 1.0


def test_tvd_mi_contingency(spark, sf_dir):
    from excel_to_db_spark.queries.infotheory import stats_tvd_independence
    row = stats_tvd_independence(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderstatus", "o_orderpriority"])
    ct = pd.crosstab(o["o_orderstatus"], o["o_orderpriority"])
    n = int(ct.values.sum())
    na = ct.sum(axis=1)
    nb = ct.sum(axis=0)
    num = 0
    mi_u = 0
    for a in ct.index:
        for b in ct.columns:
            nij = int(ct.loc[a, b])
            num += abs(nij * n - int(na[a]) * int(nb[b]))
            if nij > 0:
                mi_u += _ri((nij / n)
                            * math.log(nij * n / (int(na[a])
                                                  * int(nb[b]))) * 1e9)
    assert (row.n, row.n_cells) == (n, ct.shape[0] * ct.shape[1])
    assert row.tvd == _r(num / (2.0 * n * n), 8)
    assert row.mutual_info_nats == _r(mi_u / 1e9, 6)
    assert row.tvd >= 0 and row.mutual_info_nats >= -1e-9
