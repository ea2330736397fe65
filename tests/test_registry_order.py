"""The round driver verifies only the FIRST 50 registry keys (iteration
order). These tests pin the front-loaded window to the flagship
operators so an innocent import reshuffle can't silently demote them
out of driver verification."""

from excel_to_db_spark.queries import REGISTRY, _PRIORITY


def test_priority_window_is_exactly_the_first_50_keys():
    assert len(_PRIORITY) == 50
    assert list(REGISTRY)[:50] == list(_PRIORITY)


def test_priority_covers_round8_rotation():
    """Round-8 window (VERDICT r7 #1): rotate over the families with
    zero/low driver coverage through round 7 — dq plus the nine 0/4
    families (act/enc/fin/fs/inventory/linkage/mkt/process/search)
    close completely; risk-ranked picks from the big stats/text/ts/
    eval/events/ml pools fill the rest."""
    head = set(list(REGISTRY)[:50])
    for key in (
        # whole-family closures
        "dq_expectations", "dq_orphan_audit",
        "act_chain_ladder_ultimate", "enc_rle_runs",
        "fin_445_rollup", "fs_point_in_time_join",
        "inventory_newsvendor", "linkage_transitive_merge",
        "mkt_adstock_decay", "process_variants",
        "search_hybrid_rrf",
        # risk-ranked picks
        "eval_auc_rank", "ml_woe_iv", "ts_ljung_box",
        "events_funnel", "text_good_turing", "stats_theil_sen",
    ):
        assert key in head, key


def test_reorder_loses_no_keys():
    keys = list(REGISTRY)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 190
