"""Semantic guards for the feature-store batch: pure-Python PIT
recomputation at sf0.001 plus the defining no-leakage invariants."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

W7 = 7 * 86400


def _events(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "user_id", "event_type"])
    e["sec"] = e.ts.values.astype("datetime64[s]").astype("int64")
    return e


def _pit(sf_dir):
    e = _events(sf_dir)
    clicks = defaultdict(list)
    for r in e[e.event_type == "click"].itertuples():
        clicks[r.user_id].append(r.sec)
    labels = []
    for r in e[e.event_type == "purchase"].itertuples():
        f7 = sum(1 for c in clicks[r.user_id]
                 if r.sec - W7 <= c < r.sec)
        f_all = len(clicks[r.user_id])
        stale = [r.sec - c for c in clicks[r.user_id] if c < r.sec]
        labels.append((r.user_id, r.sec, f7, f_all,
                       min(stale) if stale else None))
    return labels


def test_pit_join(spark, sf_dir):
    from excel_to_db_spark.queries.featurestore import fs_point_in_time_join
    rows = {r.feature_bucket: r
            for r in fs_point_in_time_join(spark, sf_dir).collect()}
    labels = _pit(sf_dir)
    exp_n, exp_s = Counter(), Counter()
    for _, _, f7, _, _ in labels:
        b = min(f7, 10)
        exp_n[b] += 1
        exp_s[b] += f7
    assert {b: (r.n_labels, r.sum_feature)
            for b, r in rows.items()} == \
        {b: (exp_n[b], exp_s[b]) for b in exp_n}


def test_leakage_audit(spark, sf_dir):
    from excel_to_db_spark.queries.featurestore import fs_leakage_audit
    r = fs_leakage_audit(spark, sf_dir).collect()[0]
    labels = _pit(sf_dir)
    n_inf = sum(1 for _, _, f7, fa, _ in labels if fa > f7)
    s_pit = sum(f7 for _, _, f7, _, _ in labels)
    s_naive = sum(fa for _, _, _, fa, _ in labels)
    assert (r.n_labels, r.n_inflated, r.sum_pit, r.sum_naive) == \
        (len(labels), n_inf, s_pit, s_naive)
    assert r.inflation_milli == (s_naive - s_pit) * 1000 // s_pit
    # the leaky join must strictly dominate the PIT join
    assert s_naive > s_pit and n_inf > 0


def test_feature_freshness(spark, sf_dir):
    from excel_to_db_spark.queries.featurestore import fs_feature_freshness
    rows = {r.staleness_hours: r
            for r in fs_feature_freshness(spark, sf_dir).collect()}
    labels = _pit(sf_dir)
    exp = {}
    for _, _, _, _, stale in labels:
        if stale is None:
            continue
        b = min(stale // 3600, 24)
        n, lo, hi = exp.get(b, (0, stale, stale))
        exp[b] = (n + 1, min(lo, stale), max(hi, stale))
    assert {b: (r.n_labels, r.min_sec, r.max_sec)
            for b, r in rows.items()} == exp


def test_training_skew(spark, sf_dir):
    from excel_to_db_spark.queries.featurestore import fs_training_skew
    rows = {r.bucket: r for r in fs_training_skew(spark, sf_dir).collect()}
    labels = _pit(sf_dir)
    mid = (min(s for _, s, *_ in labels)
           + max(s for _, s, *_ in labels)) // 2
    tr, sv = Counter(), Counter()
    for _, s, f7, _, _ in labels:
        (tr if s < mid else sv)[min(f7, 10)] += 1
    tt, ts = sum(tr.values()), sum(sv.values())
    tvd = sum(abs(tr[b] * 10 ** 6 // tt - sv[b] * 10 ** 6 // ts)
              for b in set(tr) | set(sv)) // 2
    for b, r in rows.items():
        assert (r.n_train, r.n_serve) == (tr[b], sv[b])
        assert r.train_share_micro == tr[b] * 10 ** 6 // tt
        assert r.serve_share_micro == sv[b] * 10 ** 6 // ts
        assert r.tvd_micro == tvd
    assert set(rows) == set(tr) | set(sv)
