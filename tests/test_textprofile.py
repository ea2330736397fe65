"""Semantic guards for the corpus-profiling batch: syllable census vs
a regex replay, Yule's K vs Counter algebra, lexical profile vs pandas
groupbys, and rank-turbulence divergence vs a dict-based replay."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd


def _r(x, d):
    scale = 10 ** d
    return math.floor(abs(x) * scale + 0.5) / scale * (1 if x >= 0 else -1)


_VOWELS = re.compile(r"[aeiouy]+")


def test_syllable_complexity_regex_replay(spark, sf_dir):
    from excel_to_db_spark.queries.textprofile import (
        text_syllable_complexity)
    rows = {r.source: r
            for r in text_syllable_complexity(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    for src, grp in d.groupby("source"):
        words = [w for t in grp["text"] for w in t.split(" ")]
        syl = [len(_VOWELS.findall(w)) for w in words]
        row = rows[src]
        assert (row.n_words, row.n_syllables) == (len(words), sum(syl))
        assert row.syl_per_word == _r(sum(syl) / len(words), 4)
        assert row.pct_complex == _r(
            sum(1 for s in syl if s >= 3) / len(words), 6)
        assert row.fk_grade == _r(
            0.39 * 15.0 + 11.8 * (sum(syl) / len(words)) - 15.59, 4)


def _trigram_counter(sf_dir, pred=None):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    cnt = Counter()
    for _, rec in d.iterrows():
        if pred and not pred(rec["doc_id"]):
            continue
        w = rec["text"].split(" ")
        for i in range(len(w) - 2):
            cnt[f"{w[i]} {w[i+1]} {w[i+2]}"] += 1
    return cnt


def test_yule_k_counter_algebra(spark, sf_dir):
    from excel_to_db_spark.queries.textprofile import text_yule_k
    row = text_yule_k(spark, sf_dir).collect()[0]
    cnt = _trigram_counter(sf_dir)
    n = sum(cnt.values())
    r2 = sum(v * v for v in cnt.values())
    assert (row.v, row.n) == (len(cnt), n)
    assert row.yule_k == _r(1e4 * (r2 - n) / (float(n) * float(n)), 6)
    assert row.yule_k > 0


def test_lexical_profile_pandas(spark, sf_dir):
    from excel_to_db_spark.queries.textprofile import text_lexical_profile
    rows = {r.source: r
            for r in text_lexical_profile(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["source", "text"])
    for src, grp in d.groupby("source"):
        words = [w for t in grp["text"] for w in t.split(" ")]
        cnt = Counter(words)
        row = rows[src]
        assert (row.n_types, row.n_tokens) == (len(cnt), len(words))
        assert row.ttr == _r(len(cnt) / len(words), 6)
        hapax = sum(1 for v in cnt.values() if v == 1)
        assert row.hapax_share == _r(hapax / len(cnt), 6)
        assert row.mean_word_len == _r(
            sum(len(w) for w in words) / len(words), 4)


def test_rank_turbulence_dict_replay(spark, sf_dir):
    from excel_to_db_spark.queries.textprofile import text_rank_turbulence
    row = text_rank_turbulence(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    halves = [Counter(), Counter()]
    for _, rec in d.iterrows():
        halves[rec["doc_id"] % 2].update(rec["text"].split(" "))

    def ranks(c):
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        return {w: i + 1 for i, (w, _) in enumerate(ordered)}

    r1, r2 = ranks(halves[0]), ranks(halves[1])
    m1, m2 = len(r1), len(r2)
    union = set(r1) | set(r2)
    d_u = sum(round(abs(1.0 / r1.get(w, m1 + 1)
                        - 1.0 / r2.get(w, m2 + 1)) * 1e9)
              for w in union)
    excl = sum(1 for w in union if w not in r1 or w not in r2)
    assert (row.n_union, row.n_exclusive) == (len(union), excl)
    assert row.rtd == _r(d_u / 1e9, 6)
    assert row.rtd >= 0.0
