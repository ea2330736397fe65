"""Semantic guards for the customer-dynamics batch: migration matrix,
month streaks, and interpurchase gaps recomputed brute-force in
pandas from the raw parquet — exact ranks, island grouping, and day
arithmetic included."""

from __future__ import annotations

import pandas as pd

SPLIT = pd.Timestamp("1998-05-01")


def _orders(sf_dir):
    return pd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"])


def test_segment_migration_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.custdyn import \
        customer_segment_migration
    rows = customer_segment_migration(spark, sf_dir).collect()
    o = _orders(sf_dir)
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    o["period"] = (o["o_orderdate"] >= SPLIT).astype(int)
    segs = {}
    for p, g in o.groupby("period"):
        sp = (g.groupby("o_custkey")["cents"].sum()
              .reset_index()
              .sort_values(["cents", "o_custkey"],
                           ascending=[False, True])
              .reset_index(drop=True))
        n = len(sp)
        for rk, ck in enumerate(sp["o_custkey"]):
            segs.setdefault(int(ck), {})[p] = rk * 3 // n
    matrix = {}
    for ck, d in segs.items():
        key = (d.get(0, 3), d.get(1, 3))
        matrix[key] = matrix.get(key, 0) + 1
    tot = sum(matrix.values())
    exp = {k: (v, v * 1_000_000 // tot) for k, v in matrix.items()}
    got = {(r.from_seg, r.to_seg): (r.n_customers, r.share_micro)
           for r in rows}
    assert got == exp


def test_order_streaks_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.custdyn import \
        customer_order_streaks
    rows = customer_order_streaks(spark, sf_dir).collect()
    o = _orders(sf_dir)
    o["m"] = ((o["o_orderdate"].dt.year - 1995) * 12
              + o["o_orderdate"].dt.month - 1)
    exp = {}
    for ck, g in o.groupby("o_custkey"):
        ms = sorted(set(g["m"]))
        streak = 1
        lens = []
        for a, b in zip(ms, ms[1:]):
            if b == a + 1:
                streak += 1
            else:
                lens.append(streak)
                streak = 1
        lens.append(streak)
        for ln in lens:
            n_s, cks = exp.get(ln, (0, set()))
            cks.add(ck)
            exp[ln] = (n_s + 1, cks)
    expected = {ln: (n_s, len(cks)) for ln, (n_s, cks) in exp.items()}
    got = {r.streak_len: (r.n_streaks, r.n_customers) for r in rows}
    assert got == expected


def test_interpurchase_hist_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.custdyn import \
        customer_interpurchase_hist
    rows = customer_interpurchase_hist(spark, sf_dir).collect()
    o = _orders(sf_dir).sort_values(["o_custkey", "o_orderdate",
                                     "o_orderkey"])
    gaps = []
    for _, g in o.groupby("o_custkey"):
        d = g["o_orderdate"].tolist()
        gaps.extend((b - a).days for a, b in zip(d, d[1:]))
    exp = {}
    for gd in gaps:
        b = gd // 30
        n, lo, hi = exp.get(b, (0, None, None))
        exp[b] = (n + 1, gd if lo is None else min(lo, gd),
                  gd if hi is None else max(hi, gd))
    tot = len(gaps)
    expected = {b: (n, lo, hi, n * 1_000_000 // tot)
                for b, (n, lo, hi) in exp.items()}
    got = {r.bin30: (r.n_gaps, r.min_d, r.max_d, r.share_micro)
           for r in rows}
    assert got == expected
