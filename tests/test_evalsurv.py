"""Semantic guards for the calibration/survival/risk batch: minimax
isotonic vs a true sequential PAV implementation, log-rank from a
first-principles risk-set replay, drawdown vs a running-max sweep,
and the confusion panel vs direct counts."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _pav(pos, n):
    """Sequential pool-adjacent-violators on binned (pos, n) in micro
    units — the classic stack algorithm the minimax identity equals."""
    blocks = []  # (sum_pos, sum_n)
    for p, c in zip(pos, n):
        blocks.append((p, c))
        while (len(blocks) > 1
               and blocks[-2][0] * blocks[-1][1]
               >= blocks[-1][0] * blocks[-2][1]):
            p2, c2 = blocks.pop()
            p1, c1 = blocks.pop()
            blocks.append((p1 + p2, c1 + c2))
    # expand block means back to bins
    res = []
    i = 0
    for p, c in blocks:
        # count how many original bins the block covers by re-walking
        covered_n = 0
        start = i
        while covered_n < c:
            covered_n += n[i]
            i += 1
        res.extend([round(p * 1e6 / c)] * (i - start))
    return res


def test_isotonic_equals_sequential_pav(spark, sf_dir):
    from excel_to_db_spark.queries.evalsurv import (
        eval_isotonic_calibration)
    rows = sorted(eval_isotonic_calibration(spark, sf_dir).collect(),
                  key=lambda r: r.bin)
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ratio = d["n_chars"] / d["n_chars"].max()
    conf6 = np.floor(ratio * 1e6 + 0.5) / 1e6
    bins = np.minimum(np.floor(conf6 * 10).astype(int), 9)
    label = (d["lang"] == "en").astype(int)
    pos = [int(label[bins == r.bin].sum()) for r in rows]
    n = [int((bins == r.bin).sum()) for r in rows]
    assert [r.pos for r in rows] == pos
    assert [r.n for r in rows] == n
    want = _pav(pos, n)
    got = [round(r.iso_rate * 1e6) for r in rows]
    assert got == want
    # monotone non-decreasing
    assert all(a <= b for a, b in zip(got, got[1:]))
    # mass preservation: total iso mass equals total positives
    # (within micro-rounding: one ulp per bin)
    iso_mass = sum(g * c for g, c in zip(got, n)) / 1e6
    assert abs(iso_mass - sum(pos)) < len(rows)


def test_log_rank_risk_set_replay(spark, sf_dir):
    from excel_to_db_spark.queries.evalsurv import stats_log_rank
    row = stats_log_rank(spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_orderkey"])
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    o["nxt"] = o.groupby("o_custkey")["o_orderdate"].shift(-1)
    mx = o["o_orderdate"].max()
    o["t"] = np.where(o["nxt"].isna(),
                      (mx - o["o_orderdate"]).dt.days,
                      (o["nxt"] - o["o_orderdate"]).dt.days)
    o["ev"] = (~o["nxt"].isna()).astype(int)
    seg = dict(zip(cu["c_custkey"], cu["c_mktsegment"]))
    o["g"] = (o["o_custkey"].map(seg) == "BUILDING").astype(int)
    th = o.groupby("t").agg(d=("ev", "sum"),
                            d1=("ev", lambda s: 0),
                            tot=("ev", "size"),
                            tot1=("g", "sum"))
    th["d1"] = o.groupby("t").apply(
        lambda g: int((g["ev"] * g["g"]).sum()), include_groups=False)
    th = th.sort_index(ascending=False)
    th["n"] = th["tot"].cumsum()
    th["n1"] = th["tot1"].cumsum()
    ev_rows = th[th["d"] > 0]
    o1 = int(ev_rows["d1"].sum())
    e_u = sum(math.floor(r["d"] * r["n1"] / r["n"] * 1e6 + 0.5)
              for _, r in ev_rows.iterrows())
    v_u = sum(math.floor(r["d"] * (r["n1"] / r["n"])
                         * (1 - r["n1"] / r["n"])
                         * (r["n"] - r["d"]) / (r["n"] - 1) * 1e6 + 0.5)
              for _, r in ev_rows.iterrows() if r["n"] > 1)
    assert row.observed_g1 == o1
    assert row.expected_g1 == _r(e_u / 1e6, 6)
    assert row.variance == _r(v_u / 1e6, 6)
    dev = o1 - e_u / 1e6
    assert row.chi2 == _r(dev * dev / (v_u / 1e6), 6)
    assert 0.0 <= row.p_value <= 1.0


def test_max_drawdown_running_sweep(spark, sf_dir):
    from excel_to_db_spark.queries.evalsurv import ts_max_drawdown
    row = ts_max_drawdown(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().sort_index())
    peak = daily.cummax()
    dd_u = ((peak - daily) * 1e6 / peak).map(
        lambda x: math.floor(x + 0.5)).astype("int64")
    best = dd_u.idxmax()  # pandas idxmax takes the FIRST max — same tie rule
    assert row.trough_day == best
    assert row.trough_cents == daily[best]
    assert row.peak_cents == peak[best]
    assert row.max_drawdown == _r(dd_u[best] / 1e6, 6)
    assert 0.0 <= row.max_drawdown < 1.0


def test_confusion_panel_counts(spark, sf_dir):
    from excel_to_db_spark.queries.evalsurv import eval_confusion_panel
    row = eval_confusion_panel(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lab = (d["lang"] == "en").astype(int)
    pred = (d["text"].str.count("e") >= 30).astype(int)
    tp = int((lab & pred).sum())
    fp = int(((1 - lab) & pred).sum())
    fn = int((lab & (1 - pred)).sum())
    tn = int(((1 - lab) & (1 - pred)).sum())
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.accuracy == _r((tp + tn) / len(d), 6)
    assert row.precision_ == _r(tp / (tp + fp), 6)
    assert row.recall == _r(tp / (tp + fn), 6)
    assert row.f1 == _r(2.0 * tp / (2.0 * tp + fp + fn), 6)
    mcc = ((tp * tn - fp * fn)
           / math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)))
    assert row.mcc == _r(mcc, 6) + 0.0
    assert -1.0 <= row.mcc <= 1.0
