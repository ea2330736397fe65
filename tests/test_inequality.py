"""Semantic guards for the inequality/richness batch: Theil/MLD and
Atkinson vs direct numpy formulas, Good-Turing vs a Counter replay of
the trigram spectrum, and bias-corrected Chao1 algebra."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


def _spend(sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    return (pd.DataFrame({"k": o["o_custkey"], "c": cents})
            .groupby("k")["c"].sum().to_numpy())


def _trigram_counts(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    cnt = Counter()
    for t in d["text"]:
        w = t.split(" ")
        for i in range(len(w) - 2):
            cnt[f"{w[i]} {w[i+1]} {w[i+2]}"] += 1
    return cnt


def test_theil_and_mld_direct(spark, sf_dir):
    from excel_to_db_spark.queries.inequality import stats_theil_index
    row = stats_theil_index(spark, sf_dir).collect()[0]
    x = _spend(sf_dir).astype("float64")
    mu = x.mean()
    theil = float(np.mean((x / mu) * np.log(x / mu)))
    mld = float(np.mean(np.log(mu / x)))
    assert row.n == len(x)
    assert abs(row.theil_t - theil) < 1e-5
    assert abs(row.mld - mld) < 1e-5
    assert row.theil_t >= 0 and row.mld >= 0   # Jensen: both nonneg


def test_atkinson_geo_over_arith(spark, sf_dir):
    from excel_to_db_spark.queries.inequality import stats_atkinson_index
    row = stats_atkinson_index(spark, sf_dir).collect()[0]
    x = _spend(sf_dir).astype("float64")
    a1 = 1.0 - math.exp(float(np.mean(np.log(x)))) / x.mean()
    assert row.n == len(x)
    assert abs(row.atkinson_1 - a1) < 1e-5
    assert 0.0 <= row.atkinson_1 < 1.0


def test_good_turing_counter_replay(spark, sf_dir):
    from excel_to_db_spark.queries.inequality import text_good_turing
    rows = {r.r: r for r in text_good_turing(spark, sf_dir).collect()}
    cnt = _trigram_counts(sf_dir)
    fof = Counter(cnt.values())
    n_tokens = sum(cnt.values())
    assert set(rows) == {1, 2, 3, 4, 5}
    for r in range(1, 6):
        assert rows[r].n_r == fof.get(r, 0)
        if fof.get(r, 0) > 0:
            assert rows[r].r_star == _r(
                (r + 1.0) * fof.get(r + 1, 0) / fof[r], 4)
        else:
            assert rows[r].r_star is None
        assert rows[r].p0_unseen == _r(fof.get(1, 0) / n_tokens, 8)
    # the corpus must actually exercise the spectrum
    assert rows[1].n_r > 0


def test_chao1_bias_corrected_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.inequality import text_chao1_vocab
    row = text_chao1_vocab(spark, sf_dir).collect()[0]
    cnt = _trigram_counts(sf_dir)
    fof = Counter(cnt.values())
    v, n = len(cnt), sum(cnt.values())
    f1, f2 = fof.get(1, 0), fof.get(2, 0)
    assert (row.v, row.n_tokens, row.f1, row.f2) == (v, n, f1, f2)
    assert row.chao1 == _r(v + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 4)
    assert row.coverage == _r(1.0 - f1 / n, 8)
    assert row.chao1 >= v          # it is a lower bound ABOVE V
