"""Witness for embedding_pca_power: the distributed power iteration on
the exact-integer Gramian must match numpy.linalg.eigh computed
directly from the same parquet — loadings to 6 dp, eigenvalue share to
6 dp, and the Gramian itself bit-for-bit."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq


def _numpy_gram(sf_dir: str) -> np.ndarray:
    tb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    col = tb.column("embedding").combine_chunks()
    flat = np.asarray(col.values.to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    q = np.floor(flat * 1e6 + 0.5).astype(np.int64).reshape(-1, 64)
    return q.T @ q


def test_gramian_exact(spark, sf_dir):
    from excel_to_db_spark.operators.similarity import gramian_int

    want = _numpy_gram(sf_dir)
    got = np.zeros((64, 64), dtype=np.int64)
    for r in gramian_int(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")).collect():
        got[r["i"], r["j"]] = r["g"]
    assert (got == want).all()


def test_pca_matches_eigh(spark, sf_dir):
    from excel_to_db_spark.operators.similarity import pca_power

    G = _numpy_gram(sf_dir).astype(np.float64)
    w, v = np.linalg.eigh(G)
    top = v[:, -1]
    k = int(np.argmax(np.abs(top)))
    if top[k] < 0:
        top = -top
    share = float(w[-1] / np.trace(G))
    res = pca_power(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    rows = {r["dim"]: r for r in res.collect()}
    assert len(rows) == 64
    for d in range(64):
        assert abs(rows[d]["loading"] - top[d]) < 5e-6
        assert abs(rows[d]["eigval_share"] - share) < 5e-6


def test_squared_iterate_matches_eigh_direction(spark, sf_dir):
    """The 2^11-step squaring iterate must align with numpy's exact
    eigenvector to ~1e-4 — the accuracy the old 64-step iterate lacked
    (it retained ~0.36 of the second eigenvector)."""
    import numpy as np
    from excel_to_db_spark.operators.similarity import (
        gramian_int, pca_power_squared)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = gramian_int(e, "embedding", 64).collect()
    G = np.zeros((64, 64))
    for r in rows:
        G[r["i"], r["j"]] = float(r["g"])
    w, V = np.linalg.eigh(G)
    truth = V[:, int(np.argmax(w))]
    if truth[int(np.argmax(np.abs(truth)))] < 0:
        truth = -truth
    got = np.array([r.loading for r in
                    pca_power_squared(e).orderBy("dim").collect()])
    assert abs(float(np.dot(got, truth))) > 1 - 1e-6
    assert float(np.max(np.abs(got - truth))) < 1e-4
