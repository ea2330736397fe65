"""Semantic guards for the intermittent-demand batch: pure-pandas
recomputation of Croston/SBA, the SB quadrants, exact-order-statistic
pinball forecasts, and the tracking signal at sf0.001."""

from __future__ import annotations

import pandas as pd

SPLIT = 1920
N_DAYS = 2405


def _daily(sf_dir, by_part):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["day"] = (m["o_orderdate"].dt.normalize()
                - pd.Timestamp("1995-01-01")).dt.days
    m["q"] = m["l_quantity"].astype("int64")
    keys = ["l_partkey", "day"] if by_part else ["day"]
    return m.groupby(keys, as_index=False)["q"].sum()


def test_croston_sba(spark, sf_dir):
    from excel_to_db_spark.queries.forecast import ts_croston_sba
    rows = {r.part: r for r in ts_croston_sba(spark, sf_dir).collect()}
    pdm = _daily(sf_dir, True)
    tr = pdm[pdm.day < SPLIT]
    exp = {}
    for part, g in tr.groupby("l_partkey"):
        if part >= 60 or len(g) < 3:
            continue
        zbar = int(g.q.sum()) * 1_000_000 // len(g)
        pbar = (int(g.day.max() - g.day.min()) * 1_000_000
                // (len(g) - 1))
        cro = zbar * 1_000_000 // pbar
        exp[part] = (len(g), zbar, pbar, cro, cro - cro * 500_000 // pbar)
    got = {p: (r.n_d, r.zbar_micro, r.pbar_micro, r.croston_micro,
               r.sba_micro) for p, r in rows.items()}
    assert got == exp and len(exp) > 0
    # SBA must shrink Croston (bias correction is downward)
    for _, _, _, cro, sba in exp.values():
        assert 0 < sba < cro


def test_intermittency_classes(spark, sf_dir):
    from excel_to_db_spark.queries.forecast import ts_intermittency_classes
    rows = {r.quadrant: r
            for r in ts_intermittency_classes(spark, sf_dir).collect()}
    pdm = _daily(sf_dir, True)
    exp = {}
    for _, g in pdm.groupby("l_partkey"):
        n = len(g)
        if n < 2:
            continue
        sq, sq2 = int(g.q.sum()), int((g.q ** 2).sum())
        adi = N_DAYS * 1_000_000 // n
        cv2 = (n * sq2 - sq * sq) * 1_000_000 // (sq * sq)
        quad = ("smooth" if adi < 1_320_000 and cv2 < 490_000 else
                "intermittent" if adi >= 1_320_000 and cv2 < 490_000 else
                "erratic" if adi < 1_320_000 else "lumpy")
        ns, sa, sc = exp.get(quad, (0, 0, 0))
        exp[quad] = (ns + 1, sa + adi, sc + cv2)
    got = {q: r.n_parts for q, r in rows.items()}
    assert got == {q: v[0] for q, v in exp.items()}
    for q, (ns, sa, sc) in exp.items():
        assert rows[q].avg_adi_micro == sa // ns
        assert rows[q].avg_cv2_micro == sc // ns
    # the corpus is genuinely intermittent: every part has ADI >> 1.32
    assert "smooth" not in exp and "erratic" not in exp


def test_pinball_eval(spark, sf_dir):
    from excel_to_db_spark.queries.forecast import ts_pinball_eval
    rows = {r.qp: r for r in ts_pinball_eval(spark, sf_dir).collect()}
    dt = _daily(sf_dir, False)
    tr = sorted(dt[dt.day < SPLIT].q.tolist())
    te = dt[dt.day >= SPLIT].q.tolist()
    for qp in (10, 50, 90):
        k = (len(tr) * qp + 99) // 100
        f = tr[k - 1]
        loss = sum(qp * (y - f) if y >= f else (100 - qp) * (f - y)
                   for y in te)
        assert (rows[qp].f, rows[qp].n_test, rows[qp].loss100) == \
            (f, len(te), loss)
    # monotone forecasts
    assert rows[10].f <= rows[50].f <= rows[90].f


def test_tracking_signal(spark, sf_dir):
    from excel_to_db_spark.queries.forecast import ts_tracking_signal
    rows = {r.dow: r for r in ts_tracking_signal(spark, sf_dir).collect()}
    dt = _daily(sf_dir, False)
    dt["dow"] = dt.day % 7
    fm = {d: int(g.q.sum()) * 1_000_000 // len(g)
          for d, g in dt[dt.day < SPLIT].groupby("dow")}
    for d, g in dt[dt.day >= SPLIT].groupby("dow"):
        errs = [int(q) * 1_000_000 - fm[d] for q in g.q]
        cum = sum(errs)
        mad = sum(abs(e) for e in errs) // len(errs)
        ts = abs(cum) * 1000 // mad * (1 if cum >= 0 else -1)
        r = rows[d]
        assert (r.n_test, r.cum_err_micro, r.mad_micro) == \
            (len(errs), cum, mad)
        assert r.ts_milli == ts
