"""Semantic guards for the uplift batch: decile panel and Qini curve
recomputed brute-force in pandas — exact desc-score ranks, per-arm
counts, and the integer milli Qini formula."""

from __future__ import annotations

import pandas as pd


def _panel(sf_dir):
    o = pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_acctbal"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    resp = (li.assign(r=(li["l_returnflag"] == "R").astype(int))
            .groupby("l_orderkey")["r"].max())
    d = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    d["treated"] = d["o_orderpriority"].isin(
        ["1-URGENT", "2-HIGH"]).astype(int)
    d["responded"] = d["o_orderkey"].map(resp).fillna(0).astype(int)
    d = d.sort_values(["c_acctbal", "o_orderkey"],
                      ascending=[False, True]).reset_index(drop=True)
    n = len(d)
    d["decile"] = (d.index * 10) // n
    g = d.groupby("decile").agg(
        n_t=("treated", "sum"),
        n=("treated", "size"),
        r_t=("responded", lambda s: 0),  # placeholder, fixed below
    )
    g["n_c"] = g["n"] - g["n_t"]
    rt = d[d["treated"] == 1].groupby("decile")["responded"].sum()
    rc = d[d["treated"] == 0].groupby("decile")["responded"].sum()
    g["r_t"] = rt.reindex(g.index, fill_value=0)
    g["r_c"] = rc.reindex(g.index, fill_value=0)
    return g[["n_t", "n_c", "r_t", "r_c"]]


def test_response_deciles_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.uplift import uplift_response_deciles
    rows = uplift_response_deciles(spark, sf_dir).collect()
    g = _panel(sf_dir)
    assert len(rows) == 10
    for r in rows:
        e = g.loc[r.decile]
        nt, nc, rt, rc = (int(e.n_t), int(e.n_c), int(e.r_t),
                          int(e.r_c))
        assert (r.n_t, r.n_c, r.r_t, r.r_c) == (nt, nc, rt, rc)
        assert r.rate_t_micro == rt * 1_000_000 // nt
        assert r.rate_c_micro == rc * 1_000_000 // nc
        assert r.uplift_micro == (rt * 1_000_000 // nt
                                  - rc * 1_000_000 // nc)


def test_qini_points_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.uplift import uplift_qini_points
    rows = uplift_qini_points(spark, sf_dir).collect()
    g = _panel(sf_dir).sort_index().cumsum()
    assert len(rows) == 10
    for r in rows:
        e = g.loc[r.decile]
        ct, cc, crt, crc = (int(e.n_t), int(e.n_c), int(e.r_t),
                            int(e.r_c))
        assert (r.cum_t, r.cum_c, r.cum_rt, r.cum_rc) == \
            (ct, cc, crt, crc)
        assert r.qini_milli == crt * 1000 - crc * ct * 1000 // cc
    # curve endpoint covers the whole corpus
    last = max(rows, key=lambda r: r.decile)
    tot = _panel(sf_dir).sum()
    assert last.cum_t + last.cum_c == int(tot.n_t + tot.n_c)
