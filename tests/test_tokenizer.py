"""BPE trainer + BFS levels: independent pure-Python witnesses.

The DuckDB oracle (tools/check.py) is one witness; these tests are the
second, engine-free one — a from-scratch Python reimplementation of the
pinned contract run against the same sf0.001 parquet, plus targeted
semantics checks for the replace-pass merge rule the contract pins.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

from excel_to_db_spark.queries.tokenizer import (
    N_MERGES, N_REPLACE_PASSES, bpe_tokenize_corpus, bpe_train_merges)
from excel_to_db_spark.queries.events_graph import graph_bfs_levels

SF = "/root/testdata/sf0.001"


def _py_reprs():
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc = Counter()
    for t in texts.column("text").to_pylist():
        for w in re.findall(r"[a-z]+", (t or "").lower()):
            if len(w) >= 2:
                wc[w] += 1
    return {"|" + "|".join(w) + "|": c for w, c in wc.items()}


def _py_pair_counts(reprs):
    pc = Counter()
    for r, c in reprs.items():
        syms = [s for s in r.split("|") if s]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += c
    return pc


def _py_train():
    reprs = _py_reprs()
    merges = []
    for rank in range(1, N_MERGES + 1):
        pc = _py_pair_counts(reprs)
        (lft, rgt), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, lft, rgt, cnt))
        pat, rep = f"|{lft}|{rgt}|", f"|{lft}{rgt}|"
        nxt = Counter()
        for r, c in reprs.items():
            for _ in range(N_REPLACE_PASSES):
                r = r.replace(pat, rep)
            nxt[r] += c
        reprs = dict(nxt)
    return merges, reprs


def test_bpe_merges_match_python_witness(spark):
    got = [(r["merge_rank"], r["lft"], r["rgt"], r["pair_count"])
           for r in bpe_train_merges(spark, SF).collect()]
    want, _ = _py_train()
    assert got == want


def test_bpe_tokenize_matches_python_witness(spark):
    _, reprs = _py_train()
    tok = Counter()
    for r, c in reprs.items():
        for s in r.split("|"):
            if s:
                tok[s] += c
    want = sorted(tok.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["token"], r["n_occurrences"])
           for r in bpe_tokenize_corpus(spark, SF).collect()]
    assert got == [(t, c) for t, c in want]


def test_replace_pass_rule_on_repeated_runs():
    """The pinned merge semantics: str.replace (leftmost,
    non-overlapping, separator-consuming) composed N_REPLACE_PASSES
    times — NOT classic greedy BPE on runs. 6 repeated symbols resolve
    to aa a aa a under one pass and stay there; the pin makes both
    engines (and this witness) agree bit-for-bit."""
    s = "|a|a|a|a|a|a|"
    for _ in range(N_REPLACE_PASSES):
        s = s.replace("|a|a|", "|aa|")
    assert s == "|aa|a|aa|a|"


def test_bfs_levels_match_python_witness(spark):
    rows = graph_bfs_levels(spark, SF).collect()
    got = {r["node"]: r["level"] for r in rows}

    # Rebuild the sparsified edge list independently with DuckDB-free
    # pandas/pyarrow arithmetic (integer cents, top-2 by weight, dst ASC).
    import pandas as pd

    le = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey",
                                "l_extendedprice", "l_discount"]).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"]).to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    s = pq.read_table(f"{SF}/supplier.parquet",
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    df = (le.merge(o, left_on="l_orderkey", right_on="o_orderkey")
          .merge(c, left_on="o_custkey", right_on="c_custkey")
          .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    df = df[df.c_nationkey != df.s_nationkey].copy()
    df["w"] = ((df.l_extendedprice * (1 - df.l_discount) * 100)
               .round().astype("int64"))
    agg = (df.groupby(["c_nationkey", "s_nationkey"], as_index=False)["w"]
           .sum().rename(columns={"c_nationkey": "src", "s_nationkey": "dst"}))
    agg = agg.sort_values(["src", "w", "dst"],
                          ascending=[True, False, True])
    top2 = agg.groupby("src").head(2)
    adj: dict[int, list[int]] = {}
    for r in top2.itertuples():
        adj.setdefault(int(r.src), []).append(int(r.dst))

    want, frontier = {0: 0}, [0]
    for depth in range(1, 13):
        nxt = sorted({d for n in frontier for d in adj.get(n, ())
                      if d not in want})
        if not nxt:
            break
        for n in nxt:
            want[n] = depth
        frontier = nxt
    assert got == want


def test_bfs_output_types(spark):
    df = graph_bfs_levels(spark, SF)
    kinds = dict(df.dtypes)
    assert kinds["level"] == "int"
    assert df.count() >= 1  # at least the seed node
