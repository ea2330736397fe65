"""Build a larger synthetic scale factor by key-remapped replication.

The driver ships sf0.001/sf0.01/sf0.1 only (TESTDATA.md), but plan
stability must be proven beyond the biggest shipped SF (VERDICT r6 #4:
AQE re-plans — broadcast->SMJ flips, skew splits — only show up when
the data outgrows the thresholds). This tool replicates a source SF
directory FACTOR times with disjoint key ranges per replica, preserving
every FK relationship (lineitem->orders/part/supplier,
orders->customer) so join cardinalities scale linearly, exactly like a
bigger TPC-H SF. region/nation stay fixed (TPC-H scales facts and big
dims, never the geography).

This is a PERF fixture, not a correctness fixture: value distributions
repeat 10x (each document has FACTOR exact copies, so dedup keys see a
10-way duplicate stress test), and no oracle runs against it. Output
lands under benchdata/ (gitignored).

Usage:
    python tools/make_scale.py [--src /root/testdata/sf0.1] \
        [--dst benchdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# column -> replica stride (clean powers of ten above each key's max at
# sf0.1: o_orderkey<=149999, c_custkey<=14999, p_partkey<=19999,
# s_suppkey<=999, event_id<=99999, user_id<=1499, doc_id<=4999,
# vec_id<=1999)
STRIDES = {
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "o_custkey": 100_000, "c_custkey": 100_000,
    "p_partkey": 100_000, "l_partkey": 100_000,
    "s_suppkey": 10_000, "l_suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "doc_id": 100_000,
    "vec_id": 10_000,
}

REPLICATED = ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings")
FIXED = ("region", "nation")


def build(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t in REPLICATED:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()}
        sel = ", ".join(
            f"CAST(t.{c} + r.i * {STRIDES[c]} AS {types[c]}) AS {c}"
            if c in STRIDES else f"t.{c}"
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' t, "
            f"      range({factor}) r(i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n, = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    build(a.src, a.dst, a.factor)
