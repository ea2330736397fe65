"""Semantic guards for the process-mining batch: pure-Python session
replay at sf0.001 recomputing variants, conformance, bottleneck
stats, and rework."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

GAP = 1800
OK = {("view", "view"), ("view", "click"), ("click", "click"),
      ("view", "purchase"), ("click", "purchase")}


def _sessions(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["ts", "user_id", "event_type",
                                 "event_id"])
    e["sec"] = e.ts.values.astype("datetime64[s]").astype("int64")
    out = []
    for uid, g in e.groupby("user_id"):
        rows = sorted(zip(g.sec, g.event_id, g.event_type))
        sid, prev = 0, None
        cur = []
        for sec, eid, et in rows:
            if prev is not None and sec - prev > GAP:
                out.append((uid, sid, cur))
                sid += 1
                cur = []
            cur.append((sec, eid, et))
            prev = sec
        out.append((uid, sid, cur))
    return out


def test_variants(spark, sf_dir):
    from excel_to_db_spark.queries.process import process_variants
    rows = process_variants(spark, sf_dir).collect()
    sess = _sessions(sf_dir)
    cnt = Counter(">".join(et for _, _, et in tr[:10])
                  for _, _, tr in sess)
    t = sum(cnt.values())
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.variant, r.n_sessions, r.share_milli, r.rnk)
            for r in sorted(rows, key=lambda r: r.rnk)] == \
        [(v, n, n * 1000 // t, i + 1) for i, (v, n) in enumerate(order)]


def test_conformance(spark, sf_dir):
    from excel_to_db_spark.queries.process import process_conformance
    r = process_conformance(spark, sf_dir).collect()[0]
    sess = _sessions(sf_dir)
    bs = be = bt = good = 0
    for _, _, tr in sess:
        ets = [et for _, _, et in tr]
        b1 = ets[0] != "view"
        b2 = ets[-1] != "purchase"
        b3 = any((a, b) not in OK for a, b in zip(ets, ets[1:]))
        bs += b1
        be += b2
        bt += b3
        good += not (b1 or b2 or b3)
    assert (r.n_sessions, r.n_conforming, r.n_bad_start, r.n_bad_end,
            r.n_bad_transition) == (len(sess), good, bs, be, bt)
    assert r.fitness_milli == good * 1000 // len(sess)


def test_bottlenecks(spark, sf_dir):
    from excel_to_db_spark.queries.process import process_bottlenecks
    rows = {(r.a, r.b): r
            for r in process_bottlenecks(spark, sf_dir).collect()}
    sess = _sessions(sf_dir)
    gaps = defaultdict(list)
    for _, _, tr in sess:
        for (s1, _, a), (s2, _, b) in zip(tr, tr[1:]):
            gaps[(a, b)].append(s2 - s1)
    for k, gs in gaps.items():
        gs.sort()
        n = len(gs)
        r = rows[k]
        assert (r.n_transitions, r.total_wait_sec) == (n, sum(gs))
        assert r.mean_gap_sec == sum(gs) // n
        assert r.p90_gap_sec == gs[(n * 90 + 99) // 100 - 1]
    assert set(rows) == set(gaps)


def test_rework(spark, sf_dir):
    from excel_to_db_spark.queries.process import process_rework
    rows = {r.activity: r for r in process_rework(spark, sf_dir).collect()}
    sess = _sessions(sf_dir)
    cnt = Counter()
    for _, _, tr in sess:
        ets = [et for _, _, et in tr]
        seen = set()
        reworked = set()
        prev = None
        for et in ets:
            if prev is not None and prev != et and et in seen:
                reworked.add(et)
            seen.add(et)
            prev = et
        cnt.update(reworked)
    assert {a: r.n_rework_sessions for a, r in rows.items()} == dict(cnt)
    for a, r in rows.items():
        assert r.rework_rate_milli == cnt[a] * 1000 // len(sess)
