"""Semantic guards for the clustering/link/effect batch: silhouette
replayed from milli-int geometry, HITS replayed as integer matrix
iterations, Cohen's d from cents power sums, and the Brier parts
against the Murphy identity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _ra(x):
    """Half-away-from-zero to integer, elementwise (Spark/DuckDB round)."""
    x = np.asarray(x, dtype="float64")
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("int64")


def _milli(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = _ra(np.stack(df["embedding"].to_numpy()).astype("float64") * 1000)
    return df["vec_id"].to_numpy(), df["label"].to_numpy(), v


def test_silhouette_matches_milli_replay(spark, sf_dir):
    from excel_to_db_spark.queries.evalml2 import eval_silhouette
    rows = {r.label: r for r in eval_silhouette(spark, sf_dir).collect()}
    ids, labels, v = _milli(sf_dir)
    cents = {}
    for c in np.unique(labels):
        m = v[labels == c]
        cents[c] = _ra(m.sum(axis=0) / len(m))
    svals = {c: [] for c in cents}
    for i in range(len(ids)):
        d2 = {c: int(((v[i] - cents[c]) ** 2).sum()) for c in cents}
        a2 = d2[labels[i]]
        b2 = min(val for c, val in d2.items() if c != labels[i])
        a, b = math.sqrt(a2), math.sqrt(b2)
        svals[labels[i]].append(_r((b - a) / max(a, b), 6))
    overall_num = sum(int(_ra(s * 1e6)) for vs in svals.values()
                      for s in vs)
    n_all = sum(len(vs) for vs in svals.values())
    want_overall = _r(overall_num / (1e6 * n_all), 6)
    for c, vs in svals.items():
        r = rows[c]
        assert r.n_points == len(vs)
        assert r.mean_s == _r(sum(int(_ra(s * 1e6)) for s in vs)
                              / (1e6 * len(vs)), 6)
        assert -1.0 <= r.mean_s <= 1.0
        assert r.overall_s == want_overall


def test_hits_matches_integer_iteration(spark, sf_dir):
    from excel_to_db_spark.queries.evalml2 import graph_hits
    got = [(r.s_suppkey, r.authority_micro, r.in_deg)
           for r in graph_hits(spark, sf_dir).collect()]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    e = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         [["o_custkey", "l_suppkey"]].drop_duplicates())
    a1 = e.groupby("l_suppkey").size() * 1_000_000
    a1n = (a1 * 1_000_000 // a1.max()).astype("int64")
    h1 = e.merge(a1n.rename("a"), left_on="l_suppkey",
                 right_index=True).groupby("o_custkey")["a"].sum()
    h1n = (h1 * 1_000_000 // h1.max()).astype("int64")
    a2 = e.merge(h1n.rename("h"), left_on="o_custkey",
                 right_index=True).groupby("l_suppkey")["h"].sum()
    a2n = (a2 * 1_000_000 // a2.max()).astype("int64")
    deg = e.groupby("l_suppkey").size()
    want = sorted(((s, int(a2n[s]), int(deg[s])) for s in a2n.index),
                  key=lambda t: (-t[1], t[0]))[:20]
    assert got == want
    assert max(a for _, a, _ in got) == 1_000_000  # max-normalized


def test_cohens_d_matches_cents_replay(spark, sf_dir):
    from excel_to_db_spark.queries.evalml2 import stats_cohens_d
    row = stats_cohens_d(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    g1 = cents[ev["event_type"] == "error"]
    g2 = cents[ev["event_type"] != "error"]
    assert (row.n1, row.n2) == (len(g1), len(g2))
    m1 = _r(int(g1.sum()) / len(g1) / 100, 6)
    m2 = _r(int(g2.sum()) / len(g2) / 100, 6)
    assert (row.mean1, row.mean2) == (m1, m2)
    v1 = ((int((g1 ** 2).sum()) - int(g1.sum()) / len(g1) * int(g1.sum()))
          / (len(g1) - 1) / 10000)
    v2 = ((int((g2 ** 2).sum()) - int(g2.sum()) / len(g2) * int(g2.sum()))
          / (len(g2) - 1) / 10000)
    sp = math.sqrt(((len(g1) - 1) * v1 + (len(g2) - 1) * v2)
                   / (len(g1) + len(g2) - 2))
    d = _r((m1 - m2) / sp, 6) + 0.0
    assert row.cohens_d == d
    n = len(g1) + len(g2)
    assert row.hedges_g == _r(d * (1.0 - 3.0 / (4.0 * n - 9.0)), 6) + 0.0
    # Hedges correction shrinks magnitude
    assert abs(row.hedges_g) <= abs(row.cohens_d)
    assert row.se_d > 0


def test_brier_parts_and_murphy_identity(spark, sf_dir):
    from excel_to_db_spark.queries.evalml2 import eval_brier_decomposition
    row = eval_brier_decomposition(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # conf exactly as the engines compute it (round-half-up at 6 dp,
    # then micro-units — double-rounding collapses to one floor+0.5)
    ratio = d["n_chars"] / d["n_chars"].max()
    conf_u = np.floor(ratio * 1e6 + 0.5).astype("int64")
    label = (d["lang"] == "en").astype(int).to_numpy()
    n = len(d)
    assert (row.n, row.n_pos) == (n, int(label.sum()))
    bs = _r(int(((conf_u - label * 1_000_000) ** 2).sum()) / (1e12 * n), 6)
    assert row.brier == bs
    bins = np.minimum(conf_u // 100_000, 9)
    base_u = label.sum() * 1e6 / n
    rel_u = res_u = 0
    for b in np.unique(bins):
        m = bins == b
        nb = int(m.sum())
        cu, pb = int(conf_u[m].sum()), int(label[m].sum())
        rel_u += math.floor(nb * (cu / nb - pb * 1e6 / nb) ** 2 / 1e6
                            + 0.5)
        res_u += math.floor(nb * (pb * 1e6 / nb - base_u) ** 2 / 1e6
                            + 0.5)
    assert row.reliability == _r(rel_u / (1e6 * n), 6)
    assert row.resolution == _r(res_u / (1e6 * n), 6)
    base = label.sum() / n
    assert row.uncertainty == _r(base * (1 - base), 6)
    # Murphy identity holds up to the within-bin variance the binning hides
    assert abs(row.brier - (row.reliability - row.resolution
                            + row.uncertainty)) < 0.05
