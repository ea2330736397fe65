"""Semantic guards for the iterative-refinement panel: IPF raking
margins recomputed brute-force in pandas with the same milli fixed
point, GESD rounds re-derived with numpy remove-the-extreme loops,
and k-truss invariants (support floor, monotone edge shrinkage)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_raking_ipf_vs_bruteforce(spark, sf_dir):
    from excel_to_db_spark.queries.iterpanel import survey_raking_ipf
    rows = survey_raking_ipf(spark, sf_dir).collect()

    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_nationkey", "c_mktsegment"])
    cells = (c.groupby(["c_nationkey", "c_mktsegment"])
             .size().rename("n").reset_index())
    big_n = int(cells["n"].sum())
    cells["w"] = 1000
    # three pinned rounds: nat margins, seg margins, nat margins —
    # all divisions truncate (// on non-negative ints), mirroring
    # both engines' integer div.
    for part, k in (("c_nationkey", 25), ("c_mktsegment", 5),
                    ("c_nationkey", 25)):
        s = cells.groupby(part).apply(
            lambda g: int((g["n"] * g["w"]).sum()),
            include_groups=False)
        tgt = (big_n * 1000 // k)
        factor_milli = {p: tgt * 1000 // int(v) for p, v in s.items()}
        cells["w"] = cells.apply(
            lambda r: int(r["w"]) * factor_milli[r[part]] // 1000,
            axis=1)

    exp = {(int(r["c_nationkey"]), r["c_mktsegment"]):
           (int(r["n"]), int(r["w"])) for _, r in cells.iterrows()}
    assert len(rows) == len(exp)  # populated (nation, segment) cells
    for r in rows:
        n, w = exp[(r.c_nationkey, r.c_mktsegment)]
        assert (r.n_customers, r.w_milli) == (n, w)

    # after the final nat round, every nation margin is within one
    # rounding step of the uniform target (IPF convergence witness)
    got = pd.DataFrame([r.asDict() for r in rows])
    marg = got.groupby("c_nationkey").apply(
        lambda g: int((g["n_customers"] * g["w_milli"]).sum()),
        include_groups=False)
    tgt = big_n * 1000 // 25
    # truncation drift per cell is bounded; margins land within a few
    # per-mille of the uniform target after the final nat round
    assert ((marg - tgt).abs() <= tgt // 50 + 5000).all()


def test_gesd_rounds_vs_numpy(spark, sf_dir):
    from excel_to_db_spark.queries.iterpanel import anomaly_gesd_rounds
    rows = sorted(anomaly_gesd_rounds(spark, sf_dir).collect(),
                  key=lambda r: r.round)

    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
    daily = (o.groupby(o["o_orderdate"].astype("datetime64[ns]")
                       .dt.date)
             .size().rename("x").reset_index()
             .rename(columns={"o_orderdate": "day"}))
    days = list(daily["day"])
    xs = [int(v) for v in daily["x"]]
    assert len(rows) == 3
    for rnd in (1, 2, 3):
        n, s = len(xs), sum(xs)
        ss = sum(v * v for v in xs)
        devs = [abs(v * n - s) for v in xs]
        best = min(range(len(xs)),
                   key=lambda i: (-devs[i], days[i]))
        r = rows[rnd - 1]
        assert r.round == rnd
        assert r.day == days[best]
        assert r.x_removed == xs[best]
        expected = int(np.round(
            devs[best] ** 2 * (n - 1) / (n * (n * ss - s * s)) * 1000))
        assert r.r2_milli == expected
        del days[best], xs[best]


def test_ktruss_invariants(spark, sf_dir):
    from excel_to_db_spark.queries.iterpanel import graph_ktruss_peel
    rows = sorted(graph_ktruss_peel(spark, sf_dir).collect(),
                  key=lambda r: r.round)
    assert [r.round for r in rows] == [1, 2]
    # peeling never grows the edge set, and a kept edge needs >=2
    # triangles, so n_edges_kept <= 3 * n_triangles / 2
    assert rows[1].n_edges_kept <= rows[0].n_edges_kept
    assert rows[1].n_triangles <= rows[0].n_triangles
    for r in rows:
        assert r.n_edges_kept * 2 <= r.n_triangles * 3
        assert r.n_triangles >= 0
