"""Semantic guards for the multivariate batch: numpy recomputation of
the Mahalanobis top-10, copula grid, closed-form eigenvalues (checked
against numpy.linalg), and partial correlation (checked against the
float formula) at sf0.001."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _counts(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type"])
    c = (e.groupby("user_id").event_type.value_counts()
         .unstack(fill_value=0))
    out = pd.DataFrame({
        "x": c.get("click", 0), "y": c.get("view", 0),
        "z": c.get("purchase", 0)}).astype("int64")
    return out.reset_index()


def _moments(u):
    n = len(u)
    out = {"n": n, "sx": int(u.x.sum()), "sy": int(u.y.sum())}
    for a, b, k in (("x", "x", "vx"), ("y", "y", "vy"), ("z", "z", "vz"),
                    ("x", "y", "vxy"), ("x", "z", "vxz"),
                    ("y", "z", "vyz")):
        s_ab = int((u[a] * u[b]).sum())
        s_a, s_b = int(u[a].sum()), int(u[b].sum())
        out[k] = (n * s_ab - s_a * s_b) * 1000 // (n * n)
    return out


def test_mahalanobis(spark, sf_dir):
    from excel_to_db_spark.queries.multivar import anomaly_mahalanobis2
    rows = anomaly_mahalanobis2(spark, sf_dir).collect()
    u = _counts(sf_dir)
    m = _moments(u)
    n, sx, sy = m["n"], m["sx"], m["sy"]
    det = m["vx"] * m["vy"] - m["vxy"] * m["vxy"]
    scores = []
    for r in u.itertuples():
        dx, dy = int(r.x) * n - sx, int(r.y) * n - sy
        num = (m["vy"] * dx * dx * 1000 // (n * n)
               - 2 * m["vxy"] * dx * dy * 1000 // (n * n)
               + m["vx"] * dy * dy * 1000 // (n * n))
        scores.append((-(num * 1000 // det), r.user_id,
                       int(r.x), int(r.y)))
    scores.sort()
    exp = [(uid, x, y, -s, i + 1)
           for i, (s, uid, x, y) in enumerate(scores[:10])]
    assert [(r.user_id, r.x, r.y, r.m2_milli, r.rnk) for r in rows] == exp
    # numpy cross-check on the winner (float Mahalanobis agrees ~1%)
    X = u[["x", "y"]].to_numpy(dtype=float)
    S = np.cov(X.T, bias=True)
    mu = X.mean(axis=0)
    d = X[u.user_id == exp[0][0]][0] - mu
    m2f = float(d @ np.linalg.inv(S) @ d)
    assert abs(exp[0][3] / 1000 - m2f) < 0.05 * m2f + 0.1


def test_copula(spark, sf_dir):
    from excel_to_db_spark.queries.multivar import stats_empirical_copula
    rows = {(r.i, r.j): r
            for r in stats_empirical_copula(spark, sf_dir).collect()}
    u = _counts(sf_dir)
    n = len(u)
    rx = {uid: i + 1 for i, (xx, uid) in enumerate(
        sorted(zip(u.x, u.user_id)))}
    ry = {uid: i + 1 for i, (yy, uid) in enumerate(
        sorted(zip(u.y, u.user_id)))}
    cells = {}
    for uid in u.user_id:
        key = ((rx[uid] - 1) * 5 // n, (ry[uid] - 1) * 5 // n)
        cells[key] = cells.get(key, 0) + 1
    dep = sum(abs(25 * c - n) for c in cells.values()) * 1000 // (50 * n)
    assert {k: r.c for k, r in rows.items()} == cells
    assert all(r.dep_milli == dep for r in rows.values())


def test_pca2(spark, sf_dir):
    from excel_to_db_spark.queries.multivar import stats_pca2_exact
    r = stats_pca2_exact(spark, sf_dir).collect()[0]
    u = _counts(sf_dir)
    m = _moments(u)
    disc = (m["vx"] - m["vy"]) ** 2 + 4 * m["vxy"] ** 2
    s = math.isqrt(disc)
    lam1, lam2 = (m["vx"] + m["vy"] + s) // 2, (m["vx"] + m["vy"] - s) // 2
    assert (r.vx_milli, r.vy_milli, r.vxy_milli) == \
        (m["vx"], m["vy"], m["vxy"])
    assert (r.lam1_milli, r.lam2_milli) == (lam1, lam2)
    # numpy eigenvalues agree to milli rounding
    S = np.array([[m["vx"], m["vxy"]], [m["vxy"], m["vy"]]], dtype=float)
    w = sorted(np.linalg.eigvalsh(S), reverse=True)
    assert abs(lam1 - w[0]) <= 1 and abs(lam2 - w[1]) <= 1


def test_partial_corr(spark, sf_dir):
    from excel_to_db_spark.queries.multivar import stats_partial_corr
    r = stats_partial_corr(spark, sf_dir).collect()[0]
    u = _counts(sf_dir)
    # float reference
    c = np.corrcoef(np.stack([u.x, u.y, u.z]).astype(float))
    rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
    pf = (rxy - rxz * ryz) / math.sqrt((1 - rxz ** 2) * (1 - ryz ** 2))
    assert abs(r.rxy_micro / 1e6 - rxy) < 2e-3
    assert abs(r.partial_xy_z_milli / 1000 - pf) < 5e-3
    assert -1000 <= r.partial_xy_z_milli <= 1000
