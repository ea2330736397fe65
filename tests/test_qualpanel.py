"""Semantic guards for the DQ/distribution batch: FD census vs pandas
nunique, time-to-convert vs a per-user loop, QQ deciles vs numpy
order statistics, and trimmed mean vs direct sorting."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_fd_census_pandas_nunique(spark, sf_dir):
    from excel_to_db_spark.queries.qualpanel import dq_functional_dependency
    rows = {r.fd: r
            for r in dq_functional_dependency(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])
    k1 = li.groupby(["l_partkey", "l_quantity"])["l_extendedprice"]\
        .nunique()
    k2 = li.groupby("l_partkey")["l_extendedprice"].nunique()
    r1 = rows["partkey,quantity->extendedprice"]
    assert (r1.n_groups, r1.n_violating) == (len(k1),
                                             int((k1 > 1).sum()))
    assert r1.max_distinct_rhs == int(k1.max())
    assert r1.violation_rate == _r(int((k1 > 1).sum()) / len(k1), 6)
    r2 = rows["partkey->extendedprice"]
    assert (r2.n_groups, r2.n_violating) == (len(k2),
                                             int((k2 > 1).sum()))
    # nesting: the weaker FD violates at least as hard as the stronger
    assert r2.violation_rate >= r1.violation_rate
    assert r2.max_distinct_rhs >= r1.max_distinct_rhs


def test_time_to_convert_user_loop(spark, sf_dir):
    from excel_to_db_spark.queries.qualpanel import events_time_to_convert
    row = events_time_to_convert(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    ev["s"] = (ev["ts"].astype("datetime64[ns]").astype("int64")
               // 10 ** 9)
    lats = []
    for uid, grp in ev.groupby("user_id"):
        clicks = grp.loc[grp["event_type"] == "click", "s"]
        if clicks.empty:
            continue
        fc = int(clicks.min())
        purch = grp.loc[(grp["event_type"] == "purchase")
                        & (grp["s"] >= fc), "s"]
        if purch.empty:
            continue
        lats.append(int(purch.min()) - fc)
    lats.sort()
    n = len(lats)
    assert row.n_converted == n
    assert row.p25_s == lats[math.ceil(0.25 * n) - 1]
    assert row.p50_s == lats[math.ceil(0.50 * n) - 1]
    assert row.p75_s == lats[math.ceil(0.75 * n) - 1]
    assert row.p25_s <= row.p50_s <= row.p75_s


def test_qq_deciles_numpy_order_stats(spark, sf_dir):
    from excel_to_db_spark.queries.qualpanel import stats_qq_deciles
    rows = {r.q10: r for r in stats_qq_deciles(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    click = np.sort(cents[ev["event_type"] == "click"].to_numpy())
    view = np.sort(cents[ev["event_type"] == "view"].to_numpy())
    assert set(rows) == set(range(1, 10))
    for q in range(1, 10):
        cq = int(click[(q * len(click) + 9) // 10 - 1])
        vq = int(view[(q * len(view) + 9) // 10 - 1])
        assert rows[q].click_q == _r(cq / 100.0, 2)
        assert rows[q].view_q == _r(vq / 100.0, 2)
        assert rows[q].qq_ratio == _r(cq / vq, 6)
    # deciles are monotone
    cs = [rows[q].click_q for q in range(1, 10)]
    assert all(a <= b for a, b in zip(cs, cs[1:]))


def test_trimmed_mean_direct_sort(spark, sf_dir):
    from excel_to_db_spark.queries.qualpanel import agg_trimmed_mean
    row = agg_trimmed_mean(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_totalprice"])
    c = np.sort(np.floor(o["o_totalprice"] * 100 + 0.5)
                .astype("int64"))
    n = len(c)
    k = n // 10
    mid = c[k:n - k]
    assert (row.n, row.n_trimmed_each) == (n, k)
    assert row.trimmed_mean == _r(mid.sum() / len(mid) / 100.0, 4)
    assert row.raw_mean == _r(c.sum() / n / 100.0, 4)
    # TPC-H totals are right-skewed, but trimming is two-sided; just
    # require the two means to be finite and of the same magnitude
    assert 0.5 < row.trimmed_mean / row.raw_mean < 2.0
