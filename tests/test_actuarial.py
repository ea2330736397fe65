"""Semantic guards for the actuarial batch: pure-pandas triangle /
chain-ladder / pricing / exposure recomputation at sf0.001."""

from __future__ import annotations

import datetime as dt

import pandas as pd

MAXD = 4


def _tri(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_shipdate"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    om = ((m.o_orderdate.dt.year - 1995) * 12
          + m.o_orderdate.dt.month - 1)
    sm = ((m.l_shipdate.dt.year - 1995) * 12 + m.l_shipdate.dt.month - 1)
    dev = (sm - om).clip(upper=MAXD)
    cents = (m.l_extendedprice * 100).round().astype("int64")
    inc = (pd.DataFrame({"om": om, "dev": dev, "c": cents})
           .groupby(["om", "dev"])["c"].sum())
    M = int(om.max())
    cum = {}
    for o_ in sorted(set(om)):
        run = 0
        for d in range(MAXD + 1):
            run += int(inc.get((o_, d), 0))
            cum[(o_, d)] = run
    return cum, M


def test_chain_ladder_factors(spark, sf_dir):
    from excel_to_db_spark.queries.actuarial import act_chain_ladder_factors
    rows = {r.dev: r
            for r in act_chain_ladder_factors(spark, sf_dir).collect()}
    cum, M = _tri(sf_dir)
    oms = sorted({o for o, _ in cum})
    for d in range(1, MAXD + 1):
        prev = sum(cum[(o, d - 1)] for o in oms if o + d <= M)
        nxt = sum(cum[(o, d)] for o in oms if o + d <= M)
        r = rows[d]
        assert (r.sum_prev, r.sum_next) == (prev, nxt)
        assert r.f_micro == nxt * 1_000_000 // prev
        # development factors are >= 1 (claims only accumulate)
        assert r.f_micro >= 1_000_000


def test_chain_ladder_ultimate(spark, sf_dir):
    from excel_to_db_spark.queries.actuarial import (
        act_chain_ladder_factors, act_chain_ladder_ultimate)
    f = {r.dev: r.f_micro
         for r in act_chain_ladder_factors(spark, sf_dir).collect()}
    rows = {r.om: r
            for r in act_chain_ladder_ultimate(spark, sf_dir).collect()}
    cum, M = _tri(sf_dir)
    oms = sorted({o for o, _ in cum})
    assert set(rows) == set(oms)
    for o_ in oms:
        d_latest = min(M - o_, MAXD)
        latest = cum[(o_, d_latest)]
        ult = latest
        for d in range(d_latest + 1, MAXD + 1):
            ult = ult * f[d] // 1_000_000
        r = rows[o_]
        assert (r.latest_cents, r.ultimate_cents) == (latest, ult)
        assert r.reserve_cents == ult - latest
    # fully developed origins carry no reserve; some recent one does
    # (a newest origin with an empty dev-0 diagonal legitimately
    # develops 0 -> 0, so check the last 4 origins collectively)
    assert rows[oms[0]].reserve_cents == 0
    assert any(rows[o_].reserve_cents > 0 for o_ in oms[-4:])


def test_frequency_severity(spark, sf_dir):
    from excel_to_db_spark.queries.actuarial import act_frequency_severity
    rows = {r.segment: r
            for r in act_frequency_severity(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for seg, g in m.groupby("c_mktsegment"):
        n, nc = len(g), g.o_custkey.nunique()
        tot = int((g.o_totalprice * 100).round().astype("int64").sum())
        r = rows[seg]
        assert (r.n_orders, r.n_custs) == (n, nc)
        assert r.freq_milli == n * 1000 // nc
        assert r.severity_cents == tot // n
        assert r.pure_premium_cents == tot // nc


def test_earned_exposure(spark, sf_dir):
    from excel_to_db_spark.queries.actuarial import act_earned_exposure
    rows = {r.mo: r for r in act_earned_exposure(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
    d0s = ((o.o_orderdate.dt.normalize()
            - pd.Timestamp("1995-01-01")).dt.days).tolist()
    epoch = dt.date(1995, 1, 1)
    written, earned = {}, {}
    for i in range(84):
        y, mth = divmod(i, 12)
        s = (dt.date(1995 + y, mth + 1, 1) - epoch).days
        ny, nm = (1996 + y, 1) if mth == 11 else (1995 + y, mth + 2)
        e = (dt.date(ny, nm, 1) - epoch).days
        for d0 in d0s:
            if d0 < e and d0 + 90 > s:
                earned[i] = earned.get(i, 0) + min(d0 + 90, e) - max(d0, s)
                written[i] = written.get(i, 0) + (s <= d0 < e)
    assert {m: (r.written, r.earned_days)
            for m, r in rows.items()} == \
        {m: (written[m], earned[m]) for m in earned}
    # every policy earns exactly 90 days across the calendar
    assert sum(r.earned_days for r in rows.values()) == 90 * len(d0s)
