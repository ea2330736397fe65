"""Semantic guards for the anytime-valid/financial batch: e-process
vs a sequential betting loop, risk ratios vs numpy formulas, index
bounds (Laspeyres >= Fisher >= Paasche ordering checks), and Yuen's t
vs a trim-and-winsorize replay."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _daily_orders(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    return (pd.DataFrame({"d": o["o_orderdate"].dt.floor("D"),
                          "c": cents})
            .groupby("d")["c"].sum().sort_index())


def test_e_process_betting_loop(spark, sf_dir):
    from excel_to_db_spark.queries.finpanel import stats_e_process
    row = stats_e_process(spark, sf_dir).collect()[0]
    y = _daily_orders(sf_dir).to_numpy()
    log_e, best, first = 0.0, -1.0, None
    n_moves = 0
    days = _daily_orders(sf_dir).index
    for i in range(1, len(y)):
        if y[i] == y[i - 1]:
            continue
        n_moves += 1
        log_e += math.log(1.2) if y[i] > y[i - 1] else math.log(0.8)
        best = max(best, log_e)
        if first is None and log_e > math.log(20.0):
            first = days[i]
    assert row.n_moves == n_moves
    # the key rounds at 6dp, so tiny e-values legitimately print 0.0
    assert abs(row.final_e - math.exp(log_e)) \
        < max(1e-4 * math.exp(log_e), 5.1e-7)
    assert abs(row.max_e - math.exp(best)) \
        < max(1e-4 * math.exp(best), 5.1e-7)
    assert row.first_rejection_day == first
    assert row.max_e >= row.final_e >= 0


def test_risk_ratios_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.finpanel import ts_risk_adjusted_returns
    row = ts_risk_adjusted_returns(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().sort_index().to_numpy())
    r = np.round(np.log(daily[1:] / daily[:-1]) * 1e6)
    assert row.n == len(r)
    sharpe = r.mean() / r.std()
    sortino = r.mean() / math.sqrt((np.minimum(r, 0) ** 2).mean())
    c = np.cumsum(r)
    dd = float((np.maximum.accumulate(c) - c).max())
    calmar = r.mean() / dd
    assert abs(row.sharpe_daily - sharpe) < 1e-4
    assert abs(row.sortino_daily - sortino) < 1e-4
    assert abs(row.calmar_daily - calmar) < 1e-4
    # downside risk can't exceed total risk => |sortino| >= |sharpe|
    assert abs(row.sortino_daily) >= abs(row.sharpe_daily) - 1e-9


def test_fisher_bounds_and_consistency(spark, sf_dir):
    from excel_to_db_spark.queries.finpanel import price_index_fisher
    row = price_index_fisher(spark, sf_dir).collect()[0]
    # Fisher is the geometric mean: strictly between L and P
    lo, hi = sorted([row.laspeyres, row.paasche])
    assert lo - 1e-9 <= row.fisher <= hi + 1e-9
    assert row.fisher == _r(math.sqrt(row.laspeyres * row.paasche), 6)
    assert row.n_parts > 0
    # replay Paasche directly
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_quantity", "l_shipdate"])
    li["cents"] = np.floor(li["l_extendedprice"] * 100 + 0.5)\
        .astype("int64")
    li["qty"] = np.floor(li["l_quantity"] + 0.5).astype("int64")
    y = li["l_shipdate"].dt.year
    g0 = li[y == 1996].groupby("l_partkey")[["cents", "qty"]].sum()
    g1 = li[y == 1998].groupby("l_partkey")[["cents", "qty"]].sum()
    both = g0.join(g1, lsuffix="0", rsuffix="1", how="inner")
    both = both[(both["qty0"] > 0) & (both["qty1"] > 0)]
    p0 = both["cents0"] / both["qty0"]
    p1 = both["cents1"] / both["qty1"]
    pa = (sum(round(q * p * 1e4) for q, p in zip(both["qty1"], p1))
          / sum(round(q * p * 1e4) for q, p in zip(both["qty1"], p0)))
    assert row.n_parts == len(both)
    assert row.paasche == _r(pa, 6)


def test_yuen_trim_winsorize_replay(spark, sf_dir):
    from excel_to_db_spark.queries.finpanel import stats_yuen_t
    row = stats_yuen_t(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def side(grp):
        c = np.sort(np.floor(
            ev.loc[ev["event_type"] == grp, "value"] * 100 + 0.5)
            .astype("int64").to_numpy())
        n = len(c)
        g = n // 10
        h = n - 2 * g
        tmean = round(c[g:n - g].sum() / h / 100.0 * 1e6) / 1e6
        lo, hi = c[g], c[n - g - 1]
        w = np.clip(c, lo, hi).astype("float64")
        d = (n * (w * w).sum() - w.sum() ** 2) / n / (h - 1) / h / 1e4
        return n, tmean, d

    n1, tm1, d1 = side("click")
    n2, tm2, d2 = side("view")
    assert (row.n1, row.n2) == (n1, n2)
    assert row.tmean1 == tm1 and row.tmean2 == tm2
    t = (tm1 - tm2) / math.sqrt(d1 + d2)
    assert abs(row.t - t) < 2e-5
    assert 0.0 <= row.p_approx <= 1.0
