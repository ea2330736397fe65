"""Semantic guards for the SPC batch: every chart is recomputed
brute-force in pandas/numpy from the raw parquet — limits, flags,
run rules — proving the fixed-point formulations compute the
textbook Shewhart quantities, not approximations of them."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

A2_MILLI = 577
D4_MILLI = 2114


def _lineitem(sf_dir):
    d = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_returnflag", "l_shipdate"])
    d["day"] = d["l_shipdate"].dt.date
    return d


def _xbar_series(sf_dir):
    d = _lineitem(sf_dir).sort_values(["day", "l_orderkey",
                                       "l_linenumber"])
    rows = []
    for day, g in d.groupby("day", sort=True):
        if len(g) < 5:
            continue
        q = g["l_quantity"].astype("int64").to_numpy()[:5]
        rows.append((day, int(q.sum()) * 200,
                     int(q.max()) - int(q.min())))
    s = pd.DataFrame(rows, columns=["day", "xbar_milli", "r"])
    n = len(s)
    xbb = int(s["xbar_milli"].sum()) // n
    rbar = int(s["r"].sum()) * 1000 // n
    return s, n, xbb, rbar


def test_p_chart_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.spc import spc_p_chart
    rows = spc_p_chart(spark, sf_dir).collect()
    d = _lineitem(sf_dir)
    daily = d.groupby("day").agg(
        n=("l_quantity", "size"),
        dd=("l_returnflag", lambda s: int((s == "R").sum())))
    D, N = int(daily["dd"].sum()), int(daily["n"].sum())
    pbar = D * 1_000_000 // N
    got = {r.day: (r.n_items, r.n_defect, r.p_micro, r.ucl_micro,
                   r.lcl_micro, r.ooc) for r in rows}
    assert len(got) == len(daily)
    for day, row in daily.iterrows():
        n, dd = int(row["n"]), int(row["dd"])
        s3 = round(3 * math.sqrt(pbar * (1_000_000 - pbar) / n))
        p = dd * 1_000_000 // n
        ucl, lcl = pbar + s3, max(pbar - s3, 0)
        ooc = 1 if (p > ucl or p < lcl) else 0
        assert got[day] == (n, dd, p, ucl, lcl, ooc)


def test_xbar_r_chart_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.spc import spc_xbar_r_chart
    row = spc_xbar_r_chart(spark, sf_dir).collect()[0]
    s, n, xbb, rbar = _xbar_series(sf_dir)
    ucl_x = xbb + A2_MILLI * rbar // 1000
    lcl_x = xbb - A2_MILLI * rbar // 1000
    ucl_r = D4_MILLI * rbar // 1000
    n_ooc_x = int(((s["xbar_milli"] > ucl_x)
                   | (s["xbar_milli"] < lcl_x)).sum())
    n_ooc_r = int((s["r"] * 1000 > ucl_r).sum())
    assert (row.n_days, row.xbb_milli, row.rbar_milli) == (n, xbb, rbar)
    assert (row.ucl_x_milli, row.lcl_x_milli, row.ucl_r_milli) == \
        (ucl_x, lcl_x, ucl_r)
    assert (row.n_ooc_x, row.n_ooc_r) == (n_ooc_x, n_ooc_r)


def test_we_runs_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.spc import spc_we_runs
    row = spc_we_runs(spark, sf_dir).collect()[0]
    s, n, xbb, _ = _xbar_series(sf_dir)
    side = np.sign(s["xbar_milli"].to_numpy() - xbb).astype(int)
    v_above = v_below = 0
    for i in range(len(side)):
        w = side[max(0, i - 8):i + 1]
        if len(w) == 9 and (w == 1).sum() == 9:
            v_above += 1
        if len(w) == 9 and (w == -1).sum() == 9:
            v_below += 1
    max_above = max_below = cur = 0
    prev = 0
    for v in side:
        cur = cur + 1 if v == prev and v != 0 else 1
        prev = v
        if v == 1:
            max_above = max(max_above, cur)
        elif v == -1:
            max_below = max(max_below, cur)
    assert row.n_days == n
    assert (row.n_run9_above, row.n_run9_below) == (v_above, v_below)
    assert (row.max_run_above, row.max_run_below) == \
        (max_above, max_below)
