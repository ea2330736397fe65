"""Semantic guards for the inventory-economics batch: pure-pandas
recomputation of the newsvendor fractile, EOQ/safety formulas, arc
elasticity, and ABC fill rates at sf0.001."""

from __future__ import annotations

import math

import pandas as pd

SPLIT = 1920


def _daily(sf_dir, by_part):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["day"] = (m["o_orderdate"].dt.normalize()
                - pd.Timestamp("1995-01-01")).dt.days
    m["q"] = m["l_quantity"].astype("int64")
    keys = ["l_partkey", "day"] if by_part else ["day"]
    return m.groupby(keys, as_index=False)["q"].sum()


def test_newsvendor(spark, sf_dir):
    from excel_to_db_spark.queries.inventory import inventory_newsvendor
    r = inventory_newsvendor(spark, sf_dir).collect()[0]
    dt = _daily(sf_dir, False)
    tr = sorted(dt[dt.day < SPLIT].q.tolist())
    k = (len(tr) * 3 + 3) // 4
    stock = tr[k - 1]
    te = dt[dt.day >= SPLIT].q.tolist()
    under = sum(3 * (q - stock) for q in te if q > stock)
    over = sum(stock - q for q in te if q < stock)
    assert (r.stock, r.n_test, r.underage_cost, r.overage_cost) == \
        (stock, len(te), under, over)
    # at the 3/4 fractile, underage days should be the minority
    assert sum(1 for q in te if q > stock) < len(te) // 2


def test_eoq_safety(spark, sf_dir):
    from excel_to_db_spark.queries.inventory import inventory_eoq_safety
    rows = {r.part: r for r in inventory_eoq_safety(spark, sf_dir).collect()}
    pdm = _daily(sf_dir, True)
    tr = pdm[pdm.day < SPLIT]
    n_checked = 0
    for part, g in tr.groupby("l_partkey"):
        if part >= 40 or len(g) < 3:
            continue
        d, n = int(g.q.sum()), len(g)
        sq2 = int((g.q ** 2).sum())
        eoq = math.floor(math.sqrt(2 * d * 100 / 5))
        sig = math.floor(math.sqrt((n * sq2 - d * d) * 1e6 / (n * n)))
        r = rows[part]
        assert (r.d_total, r.eoq, r.sigma_milli) == (d, eoq, sig)
        assert r.safety_stock_milli == 1645 * sig * 2646 // 1000000
        n_checked += 1
    assert n_checked == len(rows) > 0


def test_price_elasticity(spark, sf_dir):
    from excel_to_db_spark.queries.inventory import econ_price_elasticity
    rows = {r.brand: r for r in econ_price_elasticity(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    m["qty"] = m.l_quantity.astype("int64")
    m["uc"] = (m.l_extendedprice * 100).round().astype("int64") // m.qty
    for brand, g in m.groupby("p_brand"):
        rs = sorted(zip(g.uc, g.qty))
        n = len(rs)
        lo = rs[:sum(1 for i in range(n) if (i + 1) * 2 <= n)]
        hi = rs[len(lo):]
        p1 = sum(u * q for u, q in lo) // sum(q for _, q in lo)
        p2 = sum(u * q for u, q in hi) // sum(q for _, q in hi)
        q1, q2 = sum(q for _, q in lo), sum(q for _, q in hi)
        den = (q2 + q1) * (p2 - p1)
        num = (q2 - q1) * (p2 + p1) * 1_000_000
        el = (abs(num) // abs(den) * (1 if (num >= 0) == (den > 0) else -1)
              if den != 0 else 0)
        r = rows[brand]
        assert (r.p1, r.p2, r.q1, r.q2) == (p1, p2, q1, q2)
        assert r.elasticity_micro == el
    assert set(rows) == set(m.p_brand.unique())


def test_fill_rate(spark, sf_dir):
    from excel_to_db_spark.queries.inventory import inventory_fill_rate
    rows = {r.cls: r for r in inventory_fill_rate(spark, sf_dir).collect()}
    pdm = _daily(sf_dir, True)
    rev = (pdm.groupby("l_partkey")["q"].sum()
           .sort_values(ascending=False))
    order = sorted(zip(-rev.values, rev.index))
    np_ = len(order)
    cls = {}
    for rk0, (_, part) in enumerate(order):
        rk = rk0 + 1
        cls[part] = ("A" if rk * 5 <= np_ else
                     "B" if rk * 2 <= np_ else "C")
    stock = {}
    tr = pdm[pdm.day < SPLIT]
    for part, g in tr.groupby("l_partkey"):
        qs = sorted(zip(g.q, g.day))
        k = (len(qs) * 90 + 99) // 100
        stock[part] = qs[k - 1][0]
    agg = {}
    for row in pdm[pdm.day >= SPLIT].itertuples():
        part = row.l_partkey
        if part not in stock:
            continue
        c = cls[part]
        filled = min(int(row.q), stock[part])
        n, d, f = agg.get(c, (0, 0, 0))
        agg[c] = (n + 1, d + int(row.q), f + filled)
    for c, (n, d, f) in agg.items():
        r = rows[c]
        assert (r.n_demand_days, r.total_demand, r.total_filled) == (n, d, f)
        assert r.fill_rate_micro == f * 1_000_000 // d
    assert set(rows) == set(agg)
    # A parts carry most demand; fill rates are sane micros
    for r in rows.values():
        assert 0 < r.fill_rate_micro <= 1_000_000
