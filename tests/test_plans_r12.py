"""Round-12 plan guards: the shapes the optimization rounds bought stay
bought. Pins (VERDICT r11 #6 + the r12 rewrites):

- stream_stateful_timeout is the one-pass batch window emulation — no
  per-group Python state protocol, one keyed exchange;
- the wedge keys (jaccard / LP panel / holdout) read ONE checkpointed
  edge set (no parquet re-scan subtrees) and never nested-loop;
- graph_kcore's unrolled rounds are delta-degree updates — no per-round
  LeftSemi edge rewrites;
- LPA rounds keep the broadcast label side (no sort-merge of the edge
  list per round);
- linkage_fellegi_sunter's pair stage stays regex-split-free
  (substring_index only);
- the dq census keys build their whole answer as ONE plan (no eager
  driver .count() jobs at DataFrame build time).
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_checkpoint(monkeypatch):
    """Make localCheckpoint a no-op so iterative keys' UNROLLED plans
    (every round's joins) are assertable — measurement-only, the
    tools/explain.py EXPLAIN_NO_CHECKPOINT trick."""
    from pyspark.sql import DataFrame

    monkeypatch.setattr(DataFrame, "localCheckpoint",
                        lambda self, eager=True: self, raising=True)
    try:
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        monkeypatch.setattr(CDF, "localCheckpoint",
                            lambda self, eager=True: self, raising=True)
    except ImportError:
        pass


def test_stateful_timeout_is_one_pass_batch_window(spark, registry=None):
    from excel_to_db_spark.queries.curation2 import stream_stateful_timeout

    plan = _plan(stream_stateful_timeout(spark, SF_DIR))
    assert "FlatMapGroups" not in plan and "EvalPython" not in plan \
        and "MapInArrow" not in plan, "no Python boundary in the plan"
    assert plan.count("Exchange hashpartitioning") == 1, \
        "one user_id exchange serves lag, running-sum, session agg " \
        "and last-sid window"
    assert plan.count("Window") >= 2


def test_wedge_keys_share_one_checkpointed_edge_set(spark):
    from excel_to_db_spark.queries.curation3 import graph_jaccard_neighbors
    from excel_to_db_spark.queries.graphlp import (
        graph_link_prediction_panel, graph_lp_holdout_eval)

    for fn in (graph_jaccard_neighbors, graph_link_prediction_panel,
               graph_lp_holdout_eval):
        plan = _plan(fn(spark, SF_DIR))
        assert "Scan parquet" not in plan, \
            f"{fn.__name__}: every subtree must read the ONE " \
            "checkpointed edge projection (r11 re-scanned lineitem 6x)"
        # the only nested-loop allowed is the holdout's deliberate
        # 1-row scalar cross join — never an Inner pair join
        import re

        assert not re.search(r"BroadcastNestedLoopJoin .*Inner", plan)
        assert plan.count("Scan ExistingRDD") >= 4


def test_kcore_rounds_are_delta_degree_updates(spark, monkeypatch):
    _no_checkpoint(monkeypatch)
    from excel_to_db_spark.queries.estimation import graph_kcore

    plan = _plan(graph_kcore(spark, SF_DIR))
    assert "LeftSemi" not in plan, \
        "r11 re-materialized the edge set per round via two LeftSemi " \
        "joins; r12 rounds update the degree vector only"


def test_lpa_rounds_broadcast_the_label_side(spark, monkeypatch):
    _no_checkpoint(monkeypatch)
    from excel_to_db_spark.queries.graphcomm import graph_label_propagation

    plan = _plan(graph_label_propagation(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, \
        "each LPA round must broadcast the node-sized label frame"


def test_fellegi_pair_stage_is_regex_split_free(spark):
    from excel_to_db_spark.queries.linkage import linkage_fellegi_sunter

    plan = _plan(linkage_fellegi_sunter(spark, SF_DIR))
    assert "substring_index" in plan
    import re

    assert not re.search(r"(?<!_)split\(", plan), \
        "agreement fields must use substring_index, not per-pair split()"


def test_dq_census_keys_are_one_aggregating_plan(spark):
    """The r10 shape ran 2N sequential driver .count() loops and
    returned a createDataFrame of the collected literals (a
    LocalTableScan leaf with no aggregates); the r11 fold returns ONE
    plan whose branches aggregate the tables themselves. Pin the
    fold: the returned plan must contain the per-branch aggregates and
    must NOT be a local literal table."""
    from excel_to_db_spark.queries.profiling2 import (
        dq_inclusion_census, dq_key_discovery, dq_orphan_audit)

    for fn, min_aggs in ((dq_inclusion_census, 5),
                         (dq_key_discovery, 5),
                         (dq_orphan_audit, 4)):
        plan = _plan(fn(spark, SF_DIR))
        assert plan.count("HashAggregate") >= min_aggs, \
            f"{fn.__name__}: branch aggregates missing from the plan"
        assert "LocalTableScan" not in plan, \
            f"{fn.__name__}: literal result table — the r11 " \
            "single-plan fold regressed to driver-side counts"
