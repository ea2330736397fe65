"""Semantic guards for the rate-audit/lifetime batch: pure-pandas
recomputation of standardization, funnel limits, the BTYD matrix, and
the Erlang-B recursion at sf0.001."""

from __future__ import annotations

import math

import pandas as pd

SPLIT = 1920


def _panel(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey"))
    m["yr"] = m.o_orderdate.dt.year
    m["case"] = (m.l_returnflag == "R").astype(int)
    return (m.groupby(["c_nationkey", "yr"])
            .agg(n=("case", "size"), cases=("case", "sum")).reset_index())


def test_standardized_rates(spark, sf_dir):
    from excel_to_db_spark.queries.epi import epi_standardized_rates
    rows = {r.nation: r
            for r in epi_standardized_rates(spark, sf_dir).collect()}
    p = _panel(sf_dir)
    std = p.groupby("yr").agg(n_std=("n", "sum"),
                              c_std=("cases", "sum"))
    big_n = int(std.n_std.sum())
    for nat, g in p.groupby("c_nationkey"):
        obs, n = int(g.cases.sum()), int(g.n.sum())
        direct = sum((int(r.cases) * 10 ** 6 // int(r.n))
                     * int(std.loc[r.yr].n_std)
                     for r in g.itertuples()) // big_n
        exp_milli = sum(int(r.n) * (int(std.loc[r.yr].c_std) * 10 ** 6
                                    // int(std.loc[r.yr].n_std))
                        for r in g.itertuples()) // 1000
        r = rows[nat]
        assert (r.n_obs, r.observed) == (n, obs)
        assert r.crude_micro == obs * 10 ** 6 // n
        assert r.direct_micro == direct
        assert r.sir_milli == obs * 10 ** 6 // exp_milli


def test_funnel_plot(spark, sf_dir):
    from excel_to_db_spark.queries.epi import epi_funnel_plot
    rows = {r.nation: r for r in epi_funnel_plot(spark, sf_dir).collect()}
    p = _panel(sf_dir)
    big_n, big_c = int(p.n.sum()), int(p.cases.sum())
    p_std = big_c * 10 ** 6 // big_n
    for nat, g in p.groupby("c_nationkey"):
        n, cs = int(g.n.sum()), int(g.cases.sum())
        rate = cs * 10 ** 6 // n
        sd = math.floor(math.sqrt(p_std * (10 ** 6 - p_std) // n))
        hi = p_std + 1960 * sd // 1000
        lo = max(p_std - 1960 * sd // 1000, 0)
        r = rows[nat]
        assert (r.n, r.rate_micro, r.lo_micro, r.hi_micro) == \
            (n, rate, lo, hi)
        assert r.outside == int(rate > hi or rate < lo)
    # with one pooled population, most nations sit inside the funnel
    assert sum(r.outside for r in rows.values()) <= len(rows) // 2


def test_clv_btyd(spark, sf_dir):
    from excel_to_db_spark.queries.epi import clv_empirical_btyd
    rows = {(r.f, r.r): r
            for r in clv_empirical_btyd(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate"])
    o["day"] = (o.o_orderdate.dt.normalize()
                - pd.Timestamp("1995-01-01")).dt.days
    tr = o[o.day < SPLIT].groupby("o_custkey").day
    te = o[o.day >= SPLIT].groupby("o_custkey").size()
    exp = {}
    for cust, g in o[o.day < SPLIT].groupby("o_custkey"):
        f = min(len(g), 5)
        r = min((SPLIT - int(g.day.max())) // 240, 4)
        t = int(te.get(cust, 0))
        n, h = exp.get((f, r), (0, 0))
        exp[(f, r)] = (n + 1, h + t)
    assert {k: (v.n_custs, v.holdout_orders)
            for k, v in rows.items()} == exp
    for k, (n, h) in exp.items():
        assert rows[k].avg_holdout_milli == h * 1000 // n


def test_erlang_b(spark, sf_dir):
    from excel_to_db_spark.queries.epi import ops_erlang_b_blocking
    rows = {r.servers: r
            for r in ops_erlang_b_blocking(spark, sf_dir).collect()}
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "event_type"])
    clk = e[e.event_type == "click"]
    hrs = (clk.ts.values.astype("datetime64[s]").astype("int64")
           // 3600)
    lam = len(clk) * 10 ** 6 // len(set(hrs))
    a = lam // 4
    b = 10 ** 6
    for c in range(1, 11):
        x = a * b // 10 ** 6
        b = x * 10 ** 6 // (c * 10 ** 6 + x)
        r = rows[c]
        assert (r.offered_micro, r.blocking_micro) == (a, b)
    # blocking falls monotonically with more servers
    bs = [rows[c].blocking_micro for c in range(1, 11)]
    assert bs == sorted(bs, reverse=True)
