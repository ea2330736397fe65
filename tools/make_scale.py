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

Two modes (VERDICT r7 #2):

* plain (default): values repeat FACTOR times exactly — a WORST-CASE
  duplicate-mass stress for dedup/linkage (every doc/vector/name has
  FACTOR identical copies, so candidate-pair mass grows x FACTOR^2).
* --jitter: replica 0 stays pristine; replicas i>0 get DETERMINISTIC
  value perturbation on the three duplicate-mass-driving columns —
  documents.text (every 4th word suffixed, hash-phased per doc, which
  pushes cross-replica shingle Jaccard to ~0.15, far below the 0.8
  dedup threshold), embeddings.embedding (0.3*v + norm-matched seeded
  noise, cross-replica cosine ~0.29 < the 0.4 near-dup threshold), and
  part.p_name (one word replaced by a hash-lettered token, so linkage
  block keys diversify instead of colliding x10). A controlled 2%
  exact-duplicate rate survives (replica 1 keeps rows with
  id % 50 == 0 verbatim) — real corpora HAVE duplicates; the point is
  removing the x100 pair-mass artifact, not all duplicate signal.
  Everything else (keys, FKs, row counts, all other tables) is
  identical to plain mode, so timings are comparable.

This is a PERF fixture, not a correctness fixture: no oracle runs
against it. Output lands under benchdata/ (gitignored).

Usage:
    python tools/make_scale.py [--src /root/testdata/sf0.1] \
        [--dst benchdata/sf1] [--factor 10] [--jitter]
"""

from __future__ import annotations

import argparse
import hashlib
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


def _h32(s: str) -> int:
    """Deterministic 32-bit hash (stable across runs/processes —
    Python's builtin hash() is salted per process)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _keep_verbatim(orig_id: int, i: int) -> bool:
    """The controlled duplicate rate: replica 1 keeps 1-in-50 rows
    unjittered, so ~2% of the corpus has one exact cross-replica copy."""
    return i == 1 and orig_id % 50 == 0


def _jitter_text(text: str, orig_id: int, i: int) -> str:
    """Suffix every 4th word (hash-phased per (doc, replica)): a 3-gram
    shingle survives only when none of its 3 words is perturbed —
    stride 4 leaves 1/4 of shingles intact, so orig-vs-jittered Jaccard
    ~= 0.25/(2-0.25) ~ 0.14, far below the 0.8 near-dup threshold,
    while length/stopword/quality statistics stay realistic."""
    words = text.split(" ")
    phase = _h32(f"jt:{orig_id}:{i}") % 4
    return " ".join(
        f"{w}x{i}" if p % 4 == phase else w
        for p, w in enumerate(words))


def _jitter_parts(pdf, factor: int, stride: int):
    """part replicas with per-replica p_name word replacement: linkage
    block keys (first chars + size token) diversify the way a real
    catalog's new products do, instead of colliding x FACTOR."""
    import pandas as pd

    out = []
    for i in range(factor):
        rep = pdf.copy()
        rep["p_partkey"] = rep["p_partkey"] + i * stride
        if i > 0:
            def _nm(row_id, name, _i=i):
                if _keep_verbatim(row_id, _i):
                    return name
                h = _h32(f"pn:{row_id}:{_i}")
                tok = (chr(97 + h % 26) + chr(97 + (h // 26) % 26)
                       + f"c{h % 997}")
                ws = name.split(" ")
                ws[h % len(ws)] = tok
                return " ".join(ws)
            rep["p_name"] = [
                _nm(oid, nm) for oid, nm in
                zip(pdf["p_partkey"], pdf["p_name"])]
        out.append(rep)
    return pd.concat(out, ignore_index=True)


def _jitter_documents(pdf, factor: int, stride: int):
    import pandas as pd

    out = []
    for i in range(factor):
        rep = pdf.copy()
        rep["doc_id"] = rep["doc_id"] + i * stride
        if i > 0:
            rep["text"] = [
                t if _keep_verbatim(oid, i) else _jitter_text(t, oid, i)
                for oid, t in zip(pdf["doc_id"], pdf["text"])]
            rep["n_chars"] = rep["text"].str.len().astype("int64")
        out.append(rep)
    return pd.concat(out, ignore_index=True)


def _jitter_embeddings(pdf, factor: int, stride: int):
    """Replica vectors v' = 0.3*v + seeded noise scaled to |v|:
    cos(v, v') ~= 0.3/sqrt(1.09) ~= 0.29 < the 0.4 near-dup threshold,
    so cross-replica vectors stop being near-duplicates while norms
    (and thus bucket/probe distributions) stay realistic."""
    import numpy as np
    import pandas as pd

    out = []
    for i in range(factor):
        rep = pdf.copy()
        rep["vec_id"] = rep["vec_id"] + i * stride
        if i > 0:
            vecs = []
            for oid, v in zip(pdf["vec_id"], pdf["embedding"]):
                v = np.asarray(v, dtype=np.float64)
                if _keep_verbatim(oid, i):
                    vecs.append(v.astype(np.float32).tolist())
                    continue
                g = np.random.default_rng(
                    np.random.SeedSequence([int(oid), i, 7]))
                noise = g.standard_normal(v.shape[0])
                nn = np.linalg.norm(noise)
                vn = np.linalg.norm(v)
                if nn > 0 and vn > 0:
                    noise *= vn / nn
                vecs.append((0.3 * v + noise).astype(np.float32).tolist())
            rep["embedding"] = vecs
        out.append(rep)
    return pd.concat(out, ignore_index=True)


_JITTERED = {"part": ("p_partkey", _jitter_parts),
             "documents": ("doc_id", _jitter_documents),
             "embeddings": ("vec_id", _jitter_embeddings)}


def build(src: str, dst: str, factor: int, jitter: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    # Jitter mode rewrites the three value-jittered tables in Python
    # (part/documents/embeddings are <=20k rows at sf0.1 — trivial);
    # the big numeric facts stay in DuckDB either way.
    for t in REPLICATED:
        if jitter and t in _JITTERED:
            key, fn = _JITTERED[t]
            pdf = con.execute(
                f"SELECT * FROM '{src}/{t}.parquet'").fetch_df()
            rep = fn(pdf, factor, STRIDES[key])
            con.register("rep_df", rep)
            con.execute(f"COPY (SELECT * FROM rep_df) "
                        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            con.unregister("rep_df")
        else:
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
        print(f"{t}: {n} rows{' (jittered)' if jitter and t in _JITTERED else ''}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--jitter", action="store_true",
                    help="realistic-growth mode: perturb text/vector/"
                         "name values per replica (see module doc)")
    a = ap.parse_args()
    build(a.src, a.dst, a.factor, a.jitter)
