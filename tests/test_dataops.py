"""Semantic guards for the data-engineering ops batch: pure-pandas
recomputation of the packing plans, skew ranks, and bloom sizing,
plus the plans' own conservation laws."""

from __future__ import annotations

import pandas as pd

TARGET = 256 * 1024
SPLIT = 1920


def _orders(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate", "o_orderpriority",
                                 "o_custkey"])
    o["day"] = (o.o_orderdate.dt.normalize()
                - pd.Timestamp("1995-01-01")).dt.days
    o["mo"] = o.o_orderdate.dt.to_period("M")
    return o


def test_compaction_plan(spark, sf_dir):
    from excel_to_db_spark.queries.dataops import ops_compaction_plan
    rows = ops_compaction_plan(spark, sf_dir).collect()
    o = _orders(sf_dir)
    files = (o.groupby("mo").size() * 64).sort_index()
    cum = 0
    groups = {}
    for b in files:
        g = cum // TARGET
        n, tot = groups.get(g, (0, 0))
        groups[g] = (n + 1, tot + b)
        cum += b
    got = {r.grp: (r.n_files, r.bytes) for r in rows}
    assert got == groups
    for r in rows:
        assert r.fill_micro == r.bytes * 1_000_000 // TARGET
    # conservation: every file lands in exactly one group
    assert sum(r.n_files for r in rows) == len(files)
    assert sum(r.bytes for r in rows) == int(files.sum())


def test_partition_skew(spark, sf_dir):
    from excel_to_db_spark.queries.dataops import ops_partition_skew
    r = ops_partition_skew(spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    sizes = (o.groupby(["mo", "o_orderpriority"]).size()
             .reset_index(name="n"))
    ns = sorted(zip(sizes.n, sizes.mo, sizes.o_orderpriority))
    np_ = len(ns)
    med = ns[(np_ + 1) // 2 - 1][0]
    p99 = ns[(np_ * 99 + 99) // 100 - 1][0]
    assert (r.n_partitions, r.total_rows, r.max_rows) == \
        (np_, int(sizes.n.sum()), int(sizes.n.max()))
    assert (r.median_rows, r.p99_rows) == (med, p99)
    assert r.skew_ratio_micro == int(sizes.n.max()) * 1_000_000 // med


def test_incremental_plan(spark, sf_dir):
    from excel_to_db_spark.queries.dataops import ops_incremental_plan
    rows = ops_incremental_plan(spark, sf_dir).collect()
    o = _orders(sf_dir)
    days = (o[o.day >= SPLIT].groupby("day").size().sort_index())
    cum = 0
    batches = {}
    for day, n in days.items():
        b = cum // 2000
        lo, hi, nd, nr = batches.get(b, (day, day, 0, 0))
        batches[b] = (min(lo, day), max(hi, day), nd + 1, nr + int(n))
        cum += n
    got = {r.batch: (r.day_from, r.day_to, r.n_days, r.n_rows)
           for r in rows}
    assert got == batches
    # batches cover the backlog exactly once, in day order
    assert sum(r.n_rows for r in rows) == int(days.sum())
    ends = [(r.day_from, r.day_to) for r in sorted(rows,
                                                   key=lambda r: r.batch)]
    for (_, t1), (f2, _) in zip(ends, ends[1:]):
        assert t1 < f2


def test_bloom_sizing(spark, sf_dir):
    from excel_to_db_spark.queries.dataops import ops_bloom_sizing
    rows = {r.keycol: r for r in ops_bloom_sizing(spark, sf_dir).collect()}
    o = _orders(sf_dir)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey"])
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    exp = {"orders.o_custkey": o.o_custkey.nunique(),
           "lineitem.l_partkey": li.l_partkey.nunique(),
           "events.user_id": ev.user_id.nunique()}
    assert {k: r.ndv for k, r in rows.items()} == exp
    for r in rows.values():
        bits = (r.ndv * 9585 + 999) // 1000
        assert (r.bits, r.bytes, r.k_hashes) == (bits, (bits + 7) // 8, 7)
        # ~9.6 bits/key for 1% FPR
        assert 9 * r.ndv < r.bits < 10 * r.ndv
