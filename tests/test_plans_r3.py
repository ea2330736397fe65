"""Physical-plan regression guards for the relational-corners and text
packs added after the round-2 audit (queries/relational3.py,
queries/pipeline.py additions).

Same contract as tests/test_plans_r2.py: each assertion pins the plan
property that makes the operator survive a 100x scale-up, so a future
edit that silently degrades it (nested-loop fallback, extra shuffle,
lost map-side prune) fails here before any benchmark notices.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def registry():
    from excel_to_db_spark.queries import REGISTRY
    return REGISTRY


def test_null_safe_join_stays_hashable(spark, registry):
    plan = _plan(registry["join_null_safe"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, \
        "eqNullSafe must hash-join (EqualNullSafe is a valid hash key)"
    assert "BroadcastNestedLoopJoin" not in plan, \
        "null-safe equality must not degrade to nested-loop"


def test_relational_division_broadcasts_universe(spark, registry):
    plan = _plan(registry["relational_division"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sequence_gaps_bucketed_window(spark, registry):
    plan = _plan(registry["sequence_gaps"].fn(spark, SF_DIR))
    assert "hashpartitioning(bucket" in plan, \
        "full-sequence lead() must run inside hash-partitioned buckets"
    # exactly one single-partition exchange: the per-bucket min/max
    # aggregate (rows = keys/1024), never the raw key sequence
    assert plan.count("Exchange SinglePartition") == 1


def test_window_exclude_single_shuffle(spark, registry):
    plan = _plan(registry["window_exclude"].fn(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, \
        "count guard and sum must share one window shuffle"


def test_window_groups_frame_single_shuffle(spark, registry):
    plan = _plan(registry["window_groups_frame"].fn(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, \
        "dense_rank and RANGE frame share the partition key -> one shuffle"


def test_fuzzy_match_blocks_before_metric(spark, registry):
    """r9 cascade: the join condition must evaluate the precomputed
    length band and the 2-level char-count signature (two XOR +
    bit_count long ops) BEFORE the bounded levenshtein — codegen
    short-circuits conjunctions left-to-right, so the order IS the
    filter cascade."""
    plan = _plan(registry["str_fuzzy_match"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan  # theta join by design
    cond = plan.split("BroadcastNestedLoopJoin")[1].split("\n")[0]
    assert "levenshtein" in cond and "bit_count" in cond
    assert cond.index("bit_count") < cond.index("levenshtein"), \
        "short-circuit order: signature rejector must precede levenshtein"


def test_agg_mode_broadcasts_max_counts(spark, registry):
    plan = _plan(registry["agg_mode"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_is_pure_map(spark, registry):
    plan = _plan(registry["text_pii_scrub"].fn(spark, SF_DIR))
    assert "Exchange" not in plan, \
        "regex scrub is scan->project; any shuffle is a regression"


def test_entropy_two_shuffles_max(spark, registry):
    plan = _plan(registry["text_entropy"].fn(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") <= 2, \
        "(doc,token) freq + per-doc reduce; more means a lost combine"


def test_fuzzy_match_cascade_off_identical_pairs(spark, registry):
    """Forced-parameter equivalence (VERDICT r10 #6, the _lof_top3
    pattern): with the ENTIRE candidate cascade disabled — no length
    band, no rank dedup, no char-count or bigram signatures — the
    plain exhaustive formulation (lexicographic order + bounded
    levenshtein only) must yield the IDENTICAL (name_a, name_b, dist)
    tuple set. Every cascade member is provably necessary for
    lev <= 3, so equality is exact, not approximate. Uses sf0.01 for
    a non-trivial name pool."""
    from pyspark.sql import functions as F

    sf01 = "/root/testdata/sf0.01"
    fast = {(r.name_a, r.name_b, r.dist)
            for r in registry["str_fuzzy_match"].fn(spark, sf01).collect()}
    names = (spark.read.parquet(f"{sf01}/part.parquet")
             .select(F.col("p_name").alias("v")).distinct())
    a, b = names.alias("a"), names.alias("b")
    lev3 = F.levenshtein(F.col("a.v"), F.col("b.v"), 3)
    ref = {(r.name_a, r.name_b, r.dist)
           for r in (a.join(F.broadcast(b),
                            (F.col("a.v") < F.col("b.v")) & (lev3 >= 0))
                     .select(F.col("a.v").alias("name_a"),
                             F.col("b.v").alias("name_b"),
                             lev3.alias("dist"))).collect()}
    assert fast == ref and fast
