"""Text-analysis operators on crafted documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from excel_to_db_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "the cat is in the hat"),
         (1, "der hund ist nicht ein katze der die das"),
         (2, "one two three")],
        ["doc_id", "text"])


def test_token_counts(spark, docs):
    out = docs.select(
        X.token_count(F.col("text")).alias("n"),
        X.distinct_token_count(F.col("text")).alias("d")).collect()
    assert (out[0].n, out[0].d) == (6, 5)   # 'the' twice


def test_quality_features_ranges(docs):
    rows = X.quality_features(docs).collect()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 < r.type_token_ratio <= 1.0
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].stop_ratio == pytest.approx(4 / 6, abs=1e-5)  # the,is,in,the
    assert by_id[2].stop_ratio == 0.0


def test_langid_votes(docs):
    out = {r.doc_id: (r.pred_lang, r.stop_hits) for r in X.langid(docs).collect()}
    assert out[0] == ("en", 4)
    assert out[1][0] == "de"
    assert out[2] == ("de", 0)   # no hits anywhere -> tie broken by code asc


def test_fingerprints_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a"), (2, "a b c")], ["doc_id", "text"])
    rows = df.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fset"),
        X.rolling_fingerprint(F.col("text")).alias("froll")).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].fset == by_id[1].fset == by_id[2].fset
    assert by_id[0].froll == by_id[2].froll
    assert by_id[0].froll != by_id[1].froll   # order matters


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(0, "ab 12 c!")], ["doc_id", "text"])
    [r] = df.select(X.bpe_ish_token_count(F.col("text")).alias("n")).collect()
    assert r.n == 4   # ab | 12 | c | !


def test_word_ngrams_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b"), (2, "")], ["doc_id", "text"])
    rows = df.select("doc_id",
                     X.word_ngrams(F.col("text"), 3).alias("g")).collect()
    by_id = {r.doc_id: r.g for r in rows}
    assert by_id[0] == ["a b c", "b c d"]
    assert by_id[1] == []    # shorter than n: empty, NOT a reversed sequence
    assert by_id[2] == []
