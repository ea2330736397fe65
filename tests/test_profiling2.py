"""Semantic guards for the data-profiling batch: pandas recomputation
of containment, uniqueness, masks, and orphan counts at sf0.001."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd


def _col(sf_dir, table, col):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])[col]


def test_inclusion_census(spark, sf_dir):
    from excel_to_db_spark.queries.profiling2 import dq_inclusion_census
    rows = {(r.from_col, r.to_col): r
            for r in dq_inclusion_census(spark, sf_dir).collect()}
    pairs = [("orders.o_custkey", "customer.c_custkey"),
             ("lineitem.l_partkey", "part.p_partkey"),
             ("lineitem.l_suppkey", "supplier.s_suppkey"),
             ("lineitem.l_orderkey", "orders.o_orderkey"),
             ("customer.c_custkey", "supplier.s_suppkey")]
    for frm, to in pairs:
        ft, fc = frm.split(".")
        tt, tc = to.split(".")
        a = set(_col(sf_dir, ft, fc))
        b = set(_col(sf_dir, tt, tc))
        r = rows[(frm, to)]
        assert (r.n_distinct_from, r.n_contained) == \
            (len(a), len(a & b))
        assert r.containment_micro == len(a & b) * 10 ** 6 // len(a)
        assert r.is_inclusion == int(a <= b)
    # real FKs hold; the negative control does not
    assert rows[("orders.o_custkey", "customer.c_custkey")].is_inclusion
    assert not rows[("customer.c_custkey",
                     "supplier.s_suppkey")].is_inclusion


def test_key_discovery(spark, sf_dir):
    from excel_to_db_spark.queries.profiling2 import dq_key_discovery
    rows = {r.candidate: r
            for r in dq_key_discovery(spark, sf_dir).collect()}
    for t, col in (("orders", "o_orderkey"), ("part", "p_partkey"),
                   ("customer", "c_custkey"), ("orders", "o_custkey")):
        s = _col(sf_dir, t, col)
        r = rows[f"{t}.{col}"]
        assert (r.n_rows, r.ndv) == (len(s), s.nunique())
        assert r.is_key == int(s.nunique() == len(s))
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    comp = (li.l_orderkey.astype(str) + ":"
            + li.l_linenumber.astype(str))
    r = rows["lineitem.(l_orderkey, l_linenumber)"]
    assert (r.n_rows, r.ndv) == (len(comp), comp.nunique())
    # the synthetic corpus violates the nominal lineitem PK
    assert r.is_key == 0


def test_pattern_census(spark, sf_dir):
    from excel_to_db_spark.queries.profiling2 import dq_pattern_census
    rows = {}
    for r in dq_pattern_census(spark, sf_dir).collect():
        rows.setdefault(r.col, []).append((r.rnk, r.mask, r.n))
    for tbl, col in (("customer", "c_name"), ("part", "p_brand"),
                     ("orders", "o_orderpriority")):
        s = _col(sf_dir, tbl, col)
        masks = Counter(
            re.sub("[0-9]", "9",
                   re.sub("[a-z]", "a", re.sub("[A-Z]", "A", v)))
            for v in s)
        top = sorted(masks.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        exp = [(i + 1, m, n) for i, (m, n) in enumerate(top)]
        assert sorted(rows[col]) == exp
    # every customer name shares one mask
    assert len(rows["c_name"]) == 1


def test_orphan_audit(spark, sf_dir):
    from excel_to_db_spark.queries.profiling2 import dq_orphan_audit
    rows = {r.fk: r for r in dq_orphan_audit(spark, sf_dir).collect()}
    fks = (("orders", "o_custkey", "customer", "c_custkey"),
           ("lineitem", "l_orderkey", "orders", "o_orderkey"),
           ("lineitem", "l_partkey", "part", "p_partkey"),
           ("lineitem", "l_suppkey", "supplier", "s_suppkey"))
    for ft, fc, tt, tc in fks:
        fact = _col(sf_dir, ft, fc)
        dim = set(_col(sf_dir, tt, tc))
        orphans = int((~fact.isin(dim)).sum())
        r = rows[f"{ft}.{fc} -> {tt}.{tc}"]
        assert (r.n_rows, r.n_orphans) == (len(fact), orphans)
        assert r.orphan_rate_micro == orphans * 10 ** 6 // len(fact)
