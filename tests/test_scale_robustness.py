"""Regression guards for the three defect classes the round-7 sf1
execution sweep surfaced — each invisible at small SF or under the
collect()-based oracle gate:

1. int64 overflow in micro-ratio arithmetic once sums pass $92B cents
   (chain ladder; fixed by staged exact decomposition),
2. Catalyst pruning cogroup-UDF INPUT columns when the plan needs only
   row counts (df.count() crashed the Python worker at every SF),
3. hot-bucket stragglers in low-cardinality bucket self-joins that
   AQE's byte-based skew split cannot see (fixed by salting).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_micro_ratio_decomposition_matches_exact_at_int64_edge(spark):
    """The DECIMAL(38,0) form (r8, replacing r7's staged x1000 integer
    decomposition — value-identical, one cast instead of four ops) must
    equal floor(a*1e6/b) — checked with Python bigints — at magnitudes
    where the naive int64 a*1e6 overflows."""
    cases = [
        (9_223_372_036_854, 9_000_000_000_000),   # naive a*1e6 wraps
        (23_000_000_000_000, 21_500_000_000_000),  # sf1 chain-ladder scale
        (1, 3), (10**15, 10**14), (999_999, 1_000_000),
    ]
    # (valid wherever the RESULT fits int64 — link ratios are ~1-2;
    # a quotient that itself overflows, e.g. (1e15, 7), is out of the
    # operator's contract at any formulation)
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b",
        F.expr("CAST((CAST(a AS DECIMAL(38,0)) * 1000000) div b"
               " AS BIGINT)").alias("via_dec"),
        F.expr("((a * 1000) div b) * 1000"
               " + (((a * 1000) % b) * 1000) div b").alias("staged"))
    for r in df.collect():
        assert r.via_dec == r.a * 1_000_000 // r.b
        assert r.staged == r.via_dec  # the r7 form stays equivalent
    # and the naive form really does overflow at this magnitude (ANSI)
    with pytest.raises(Exception, match="(?i)overflow|try_multiply"):
        spark.createDataFrame([(10**13, 9 * 10**12)],
                              "a long, b long").select(
            F.expr("a * 1000000 div b")).collect()


def test_fold_decomposition_matches_exact_at_int64_edge(spark):
    """CAST((CAST(acc AS DECIMAL(38,0)) * x) div 1e6 AS BIGINT) ==
    acc*x // 1e6 at magnitudes where acc*x wraps int64 (the
    development-fold form, r8 DECIMAL variant), including inside the
    actual aggregate() lambda where the acc type must stay BIGINT."""
    cases = [(4_700_000_000_000, 1_999_999),      # naive acc*x wraps
             (9_200_000_000_000_000, 1_999_999),  # $92T running acc
             (123_456_789_012, 1_428_571), (1, 1_000_000)]
    df = spark.createDataFrame(cases, "acc long, x long").select(
        "acc", "x",
        F.expr("CAST((CAST(acc AS DECIMAL(38,0)) * x) div 1000000"
               " AS BIGINT)").alias("via_dec"))
    for r in df.collect():
        assert r.via_dec == r.acc * r.x // 1_000_000
    # the production fold shape: acc type stable across steps
    fold = ("aggregate(fs, acc, (acc, x) -> CAST((CAST(acc AS"
            " DECIMAL(38,0)) * x) div 1000000 AS BIGINT))")
    got = spark.createDataFrame(
        [(9_200_000_000_000_000, [2_000_000, 1_500_000, 1_000_123])],
        "acc long, fs array<bigint>").select(
        F.expr(fold).alias("u")).collect()[0].u
    want = 9_200_000_000_000_000
    for x in (2_000_000, 1_500_000, 1_000_123):
        want = want * x // 1_000_000
    assert got == want


def test_cogroup_asof_count_survives_input_pruning(spark, sf_dir):
    """df.count() on the cogroup key must work: Catalyst prunes the
    UDF's input columns when only row counts are needed, so the pandas
    frames arrive without 'ts' — the function must stay row-count
    correct under pruning and value-correct without it."""
    from excel_to_db_spark.queries.functions import cogroup_asof_pandas

    df = cogroup_asof_pandas(spark, sf_dir)
    n = df.count()                      # crashed before the fix
    rows = df.collect()                 # unpruned path: full values
    assert n == len(rows) > 0
    # unpruned values are real (NOT NULL): the pruned path emits NULL
    # for n_click_preceded, so any plan that consumed values under
    # pruning would fail this (and the oracle hash) loudly instead of
    # flowing silent zeros (ADVICE r7).
    assert all(r.n_click_preceded is not None for r in rows)
    assert all(r.n_errors >= r.n_click_preceded >= 0 for r in rows)
    assert all(r.user_id is not None for r in rows)


def test_salted_near_dup_pairs_identical_to_unsalted(spark):
    """Salting the SRP-bucket self-join must not change the pair set:
    compare salt=1 (the original single-key join) against salt=5 on a
    vector set engineered to share buckets (duplicates included)."""
    from excel_to_db_spark.operators.similarity import \
        cosine_near_dup_pairs

    vecs = [(i, [float((i % 7) + 1), float((i % 3) - 1.0),
                 1.0, float(i % 2)]) for i in range(40)]
    # exact duplicates (the hot-bucket stressor)
    vecs += [(100 + i, vecs[i][1]) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    plain = {(r.id1, r.id2, r.cos_sim) for r in cosine_near_dup_pairs(
        df, threshold=0.4, dim=4, salt=1).collect()}
    salted = {(r.id1, r.id2, r.cos_sim) for r in cosine_near_dup_pairs(
        df, threshold=0.4, dim=4, salt=5).collect()}
    assert plain == salted
    assert len(plain) > 0
