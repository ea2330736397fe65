"""Semantic guards for the sequential/boosting/bands batch: SPRT walk
replayed in integer micro-units, AdaBoost rounds vs an independent
weighted replay, Bollinger breakouts vs a rolling sweep, and TOST
p-values from the reflected A-S polynomial."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _ri(x):
    return int(np.sign(x) * math.floor(abs(x) + 0.5))


def test_sprt_walk_replay(spark, sf_dir):
    from excel_to_db_spark.queries.seqml import stats_sprt, _SPRT
    row = stats_sprt(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    d = pd.DataFrame({
        "day": ev["ts"].dt.floor("D"),
        "p": (ev["event_type"] == "purchase").astype(int)})
    daily = d.groupby("day").agg(n=("p", "size"), k=("p", "sum"))
    p0, p1, a, b = (_SPRT["p0"], _SPRT["p1"], _SPRT["a"], _SPRT["b"])
    c_pos = _ri(math.log(p1 / p0) * 1e6)
    c_neg = _ri(math.log((1 - p1) / (1 - p0)) * 1e6)
    up = _ri(math.log((1 - b) / a) * 1e6)
    lo = _ri(math.log(b / (1 - a)) * 1e6)
    assert (row.upper_u, row.lower_u) == (up, lo)
    llr, cross_step, cross_val = 0, None, None
    for i, (_, r) in enumerate(daily.sort_index().iterrows(), 1):
        llr += int(r["k"]) * c_pos + int(r["n"] - r["k"]) * c_neg
        if cross_step is None and (llr >= up or llr <= lo):
            cross_step, cross_val = i, llr
    assert row.n_steps == len(daily)
    assert row.final_llr_u == llr
    assert row.first_cross_step == cross_step
    want = ("continue" if cross_step is None
            else "accept_h1" if cross_val >= up else "accept_h0")
    assert row.decision == want


def test_adaboost_weighted_replay(spark, sf_dir):
    from excel_to_db_spark.queries.seqml import ml_adaboost
    row = ml_adaboost(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])
    q = li["l_quantity"].astype("int64").to_numpy()
    y = (li["l_returnflag"] == "R").astype(int).to_numpy()

    def best_stump(w):
        # weighted min-error stump; ties -> smallest threshold
        best = None
        nt = int(w.sum())
        pt = int(w[y == 1].sum())
        for t in sorted(np.unique(q))[:-1]:
            m = q <= t
            nl, pl = int(w[m].sum()), int(w[m & (y == 1)].sum())
            err = (min(pl, nl - pl)
                   + min(pt - pl, (nt - nl) - (pt - pl)))
            if best is None or err < best[0]:
                best = (err, t, nl, pl, nt, pt)
        return best

    unit = np.ones_like(q)
    e1, t1, nl, pl, nt, pt = best_stump(unit)
    assert (row.stump1_threshold, row.stump1_errors) == (t1, e1)
    assert row.stump1_err_rate == _r(e1 / nt, 6)
    alpha1 = _r(0.5 * math.log((nt - e1) / e1), 6)
    assert row.alpha1 == alpha1
    left_pos = 2 * pl > nl
    right_pos = 2 * (pt - pl) > nt - nl
    pred = np.where(q <= t1,
                    1 if left_pos else 0, 1 if right_pos else 0)
    wrong = (pred != y).astype(int)
    w_ok = _ri(math.exp(-alpha1) * 1e6)
    w_bad = _ri(math.exp(alpha1) * 1e6)
    w2 = np.where(wrong == 1, w_bad, w_ok).astype("int64")
    e2, t2, *_rest = best_stump(w2)
    wnt = int(w2.sum())
    assert row.stump2_threshold == t2
    assert row.stump2_werr_rate == _r(e2 / wnt, 6)
    # boosting moved the operating point or reweighted the error mass
    assert row.stump2_werr_rate > 0


def test_bollinger_rolling_sweep(spark, sf_dir):
    from excel_to_db_spark.queries.seqml import ts_bollinger
    row = ts_bollinger(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().sort_index().to_numpy())
    up = down = 0
    sig_us = []
    for i in range(6, len(daily)):
        win = daily[i - 6:i + 1]
        mid = _r(int(win.sum()) / 7, 4)
        var = (int((win.astype(object) ** 2).sum())
               - int(win.sum()) / 7 * int(win.sum())) / 7
        sigma = _r(math.sqrt(max(var, 0.0)), 4)
        sig_us.append(_ri(sigma * 100))
        if daily[i] > mid + 2 * sigma:
            up += 1
        if daily[i] < mid - 2 * sigma:
            down += 1
    assert row.n_days == len(daily) - 6
    assert (row.n_breakout_up, row.n_breakout_down) == (up, down)
    assert row.avg_sigma == _r(sum(sig_us) / len(sig_us) / 100, 4)


def test_tost_reflected_tails(spark, sf_dir):
    from excel_to_db_spark.queries.seqml import stats_tost
    row = stats_tost(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["event_type"].isin(["click", "view"])]
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    g1 = cents[ev["event_type"] == "click"]
    g2 = cents[ev["event_type"] == "view"]
    assert (row.n1, row.n2) == (len(g1), len(g2))
    diff = _r((int(g1.sum()) / len(g1) - int(g2.sum()) / len(g2)) / 100,
              6)
    assert row.diff == diff

    def var(g):
        return ((int((g ** 2).sum()) - int(g.sum()) / len(g)
                 * int(g.sum())) / (len(g) - 1) / 10000)

    se = _r(math.sqrt(var(g1) / len(g1) + var(g2) / len(g2)), 6)
    assert row.se == se
    t_lo = _r((diff + 2.0) / se, 6)
    t_up = _r((diff - 2.0) / se, 6)
    assert (row.t_lower, row.t_upper) == (t_lo, t_up)

    def upper_tail(t):
        z = abs(t) / math.sqrt(2.0)
        tt = 1.0 / (1.0 + 0.3275911 * z)
        erfc = ((0.254829592 * tt - 0.284496736 * tt**2
                 + 1.421413741 * tt**3 - 1.453152027 * tt**4
                 + 1.061405429 * tt**5) * math.exp(-z * z))
        p = 0.5 * erfc
        return _r(p if t >= 0 else 1.0 - p, 8)

    assert row.p_lower == upper_tail(t_lo)
    assert row.p_upper == upper_tail(-t_up)
    assert row.equivalent == (row.p_lower < 0.05 and row.p_upper < 0.05)
    # sanity against the true normal tail (A-S bound 1.5e-7)
    assert abs(row.p_lower
               - 0.5 * math.erfc(t_lo / math.sqrt(2.0))) < 3e-7
