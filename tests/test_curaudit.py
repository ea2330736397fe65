"""Semantic guards for the curation-audit batch: source novelty vs
set algebra, dedup length-bias AUC vs pandas ranks, CCF vs numpy
corrcoef per lag, and Hodges-Lehmann vs a brute-force Walsh median."""

from __future__ import annotations

import math
import statistics

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def test_source_novelty_set_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.curaudit import text_source_novelty
    rows = {r.source: r
            for r in text_source_novelty(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    per_src = {}
    for src, grp in d.groupby("source"):
        grams = set()
        for t in grp["text"]:
            w = t.split(" ")
            for i in range(len(w) - 2):
                grams.add(f"{w[i]} {w[i+1]} {w[i+2]}")
        per_src[src] = grams
    for src, grams in per_src.items():
        others = set().union(*(g for s, g in per_src.items()
                               if s != src))
        excl = len(grams - others)
        row = rows[src]
        assert (row.n_grams, row.n_exclusive) == (len(grams), excl)
        assert row.novelty == _r(excl / len(grams), 6)


def test_dedup_length_bias_pandas_ranks(spark, sf_dir):
    from excel_to_db_spark.queries.curaudit import dedup_length_bias_audit
    row = dedup_length_bias_audit(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "n_chars"])
    keeper = d.groupby("text")["doc_id"].transform("min")
    kept = d["doc_id"] == keeper
    assert (row.n_kept, row.n_dropped) == (int(kept.sum()),
                                           int((~kept).sum()))
    if row.n_dropped == 0:
        assert row.auc_kept_longer == 0.5
    else:
        ranks = d["n_chars"].rank(method="average")
        rk = float(ranks[kept].sum())
        nk, nd = int(kept.sum()), int((~kept).sum())
        auc = (rk - nk * (nk + 1) / 2.0) / (nk * nd)
        assert row.auc_kept_longer == _r(auc, 6)
    assert 0.0 <= row.auc_kept_longer <= 1.0


def test_ccf_numpy_per_lag(spark, sf_dir):
    from excel_to_db_spark.queries.curaudit import ts_cross_correlation
    rows = {r.lag_days: r
            for r in ts_cross_correlation(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    ev["d"] = ev["ts"].dt.floor("D")
    piv = (ev.pivot_table(index="d", columns="event_type", values="c",
                          aggfunc="sum", fill_value=0).sort_index())
    x = piv["click"].to_numpy(dtype="float64")
    y = piv["purchase"].to_numpy(dtype="float64")
    assert set(rows) == set(range(-3, 4))
    for k in range(-3, 4):
        if k >= 0:
            xa, ya = x[:len(x) - k or None], y[k:]
            if k > 0:
                xa = x[:-k]
        else:
            xa, ya = x[-k:], y[:k]
        r = float(np.corrcoef(xa, ya)[0, 1])
        assert rows[k].n == len(xa)
        assert abs(rows[k].ccf - r) < 1e-5
        assert -1.0 <= rows[k].ccf <= 1.0


def test_hodges_lehmann_brute_force(spark, sf_dir):
    from excel_to_db_spark.queries.curaudit import stats_hodges_lehmann
    row = stats_hodges_lehmann(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    daily = (pd.DataFrame({"d": ev["ts"].dt.floor("D"), "c": cents})
             .groupby("d")["c"].sum().to_numpy())
    walsh = [(int(daily[i]) + int(daily[j])) / 2.0
             for i in range(len(daily))
             for j in range(i, len(daily))]
    assert row.n_pairs == len(walsh)
    hl = statistics.median(walsh)
    assert row.hodges_lehmann == _r(hl / 100.0, 4)
    lo, hi = sorted([float(np.median(daily)), float(daily.mean())])
    assert lo / 100.0 - 1e4 <= row.hodges_lehmann <= hi / 100.0 + 1e4
