"""Quality-operator tests: plan shapes and the invariants the
docstrings in queries/quality.py promise (single-pass DQ agg,
rank-limit pushdown for the reservoir sample, Z-order tile locality,
triangle-count symmetry, decontamination directionality)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dq_expectations_all_pass_and_single_scan(spark, sf_dir):
    from excel_to_db_spark.queries.quality import dq_expectations

    rows = {r.check_name: r for r in dq_expectations(spark, sf_dir).collect()}
    assert set(rows) == {"row_count", "null_frac_orderstatus",
                         "unique_frac_orderkey", "price_in_range_frac",
                         "fk_orphans_custkey"}
    assert all(r.passed for r in rows.values())
    assert rows["null_frac_orderstatus"].metric == 0.0
    assert rows["unique_frac_orderkey"].metric == 1.0
    # one orders scan feeds the metric agg, one the anti join: exactly 2
    plan = _plan(dq_expectations(spark, sf_dir))
    assert plan.count("orders.parquet") == 2
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_sample_reservoir_pushes_rank_limit(spark, sf_dir):
    """WindowGroupLimit must appear below the window's exchange so the
    shuffle carries only k rows per group per input partition."""
    from excel_to_db_spark.queries.quality import sample_reservoir

    df = sample_reservoir(spark, sf_dir)
    assert "WindowGroupLimit" in _plan(df)
    out = df.collect()
    per = {}
    for r in out:
        per.setdefault(r.o_orderpriority, []).append(r.rk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 5
               for v in per.values())
    # determinism: a second evaluation draws the identical sample
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, sample_reservoir(spark, sf_dir).collect()))


def test_zorder_buckets_are_local_tiles(spark, sf_dir):
    """Every 64-wide Z-bucket must span at most a 16x16 tile of the
    256x256 key space — the locality that makes min/max pruning work."""
    from excel_to_db_spark.queries.quality import zorder_layout

    rows = zorder_layout(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.x_hi - r.x_lo <= 15, r
        assert r.y_hi - r.y_lo <= 15, r
    # buckets partition the data: counts sum to the table size
    n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == n


def test_graph_triangles_counts_each_once(spark, sf_dir):
    """Sum of per-node counts = 3 x number of distinct triangles, and
    every count is positive."""
    from excel_to_db_spark.queries.quality import graph_triangles

    df = graph_triangles(spark, sf_dir)
    rows = df.collect()
    total = sum(r.n_tri for r in rows)
    assert total % 3 == 0
    assert all(r.n_tri > 0 for r in rows)
    # the edge list feeds three self-join references plus the 3-way
    # node union — the expensive fact-side derivation must be computed
    # once and reused, not replayed per reference
    assert "ReusedExchange" in _plan(df)


def test_decontam_is_directional(spark, sf_dir):
    """Only odd (test) doc_ids are scored, ratios live in [0, 1], and a
    doc's contaminated grams never exceed its gram count."""
    from excel_to_db_spark.queries.quality import decontam_traintest

    rows = decontam_traintest(spark, sf_dir).collect()
    assert rows and all(r.doc_id % 2 == 1 for r in rows)
    for r in rows:
        assert 0 <= r.n_contam <= r.n_grams
        assert 0.0 <= r.contam_ratio <= 1.0


def test_events_pattern_matches_are_contiguous(spark, sf_dir):
    """Every reported match must correspond to a contiguous VCP run in
    the user's time-ordered sequence — recomputed independently in
    Python from the raw events."""
    from excel_to_db_spark.queries.quality import events_pattern

    got = {r.user_id: r.n_matches
           for r in events_pattern(spark, sf_dir).collect()}
    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "ts", "event_id", "event_type").collect())
    seqs = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        ch = {"view": "V", "click": "C", "purchase": "P"}.get(r.event_type, "x")
        seqs[r.user_id] = seqs.get(r.user_id, "") + ch
    want = {u: s.count("VCP") for u, s in seqs.items() if "VCP" in s}
    assert got == want


def test_hll_merged_and_direct_within_bounds(spark, sf_dir):
    from excel_to_db_spark.queries.quality import hll_mergeable

    rows = hll_mergeable(spark, sf_dir).collect()
    assert rows
    assert all(r.merged_within_2pct for r in rows)
    assert all(r.direct_within_2pct for r in rows)


def test_cms_never_undercounts_and_bound(spark, sf_dir):
    """CMS one-sided error: truth <= estimate <= truth + e*N/w with
    the per-row overcount bounded by total mass / width (here the
    crude deterministic bound N/w per row, min over d=4 rows)."""
    from excel_to_db_spark.queries.quality import sketch_count_min

    rows = sketch_count_min(spark, sf_dir).collect()
    assert len(rows) == 10
    n_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for r in rows:
        assert r.never_undercounts
        assert r.cms_est >= r.true_cnt
        assert r.cms_est <= r.true_cnt + n_total / 128 * 4


def test_cms_sketch_is_mergeable_cellwise(spark, sf_dir):
    """The 100 TB contract: sketching two disjoint halves and adding
    cells EQUALS the whole-corpus sketch (it's a linear sketch)."""
    from excel_to_db_spark.queries.quality import (_CMS_A, _CMS_C,
                                                   _CMS_M32, _CMS_W)

    e = spark.read.parquet(f"{sf_dir}/events.parquet")

    def build(df):
        hb = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                 1, 8), 16, 10).cast("bigint"))
        cells = F.posexplode(F.array(*[
            (F.lit(a) * hb + F.lit(c)) % _CMS_M32 % _CMS_W
            for a, c in zip(_CMS_A, _CMS_C)]))
        return (df.select(cells.alias("j", "cell"))
                .groupBy("j", "cell").agg(F.count("*").alias("c")))

    whole = {(r.j, r.cell): r.c for r in build(e).collect()}
    h0 = build(e.filter(F.col("event_id") % 2 == 0)).collect()
    h1 = build(e.filter(F.col("event_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(h0) + list(h1):
        merged[(r.j, r.cell)] = merged.get((r.j, r.cell), 0) + r.c
    assert merged == whole


def test_map_funcs_mass_conservation(spark, sf_dir):
    """Every order contributes exactly 3 surviving map entries
    (status, prio, src) after the filter drops cust."""
    from excel_to_db_spark.queries.functions import map_funcs

    rows = map_funcs(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n for r in rows) == 3 * n_orders
    assert {r.map_key for r in rows} == {"status", "prio", "src"}
