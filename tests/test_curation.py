"""Semantic guards for the corpus-curation operators: the oracle gate
proves Spark == DuckDB; these prove the operators mean what they say —
the epoch shuffle is a reproducible permutation, shard packing is
byte-balanced, temperature interleaving up-weights rare sources early,
chunk dedup keeps first occurrences in order, and the Bloom-pruned join
is semantics-invariant to whether the runtime filter fires."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_shuffle_epoch_is_reproducible_permutation(spark, sf_dir):
    from excel_to_db_spark.queries.curation import shuffle_epoch

    a = {(r.doc_id, r.pos) for r in shuffle_epoch(spark, sf_dir).collect()}
    b = {(r.doc_id, r.pos) for r in shuffle_epoch(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    assert {p for _, p in a} == set(range(1, n + 1))
    # and it is an actual shuffle, not identity order
    assert any(p != d + 1 for d, p in a)


def test_shard_pack_is_byte_balanced(spark, sf_dir):
    from excel_to_db_spark.queries.curation import shard_pack

    rows = shard_pack(spark, sf_dir).collect()
    docs = {r.doc_id: r for r in rows}
    sizes = (spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select("doc_id", "n_chars").collect())
    by_doc = {r.doc_id: r.n_chars for r in sizes}
    total = sum(by_doc.values())
    max_doc = max(by_doc.values())
    shard_bytes = {}
    for did, r in docs.items():
        shard_bytes[r.shard] = shard_bytes.get(r.shard, 0) + by_doc[did]
    assert set(shard_bytes) == set(range(16))
    for s, b in shard_bytes.items():
        assert abs(b - total / 16) <= max_doc + 16, (s, b)
    # shards are contiguous in doc_id order
    ordered = [docs[d].shard for d in sorted(docs)]
    assert ordered == sorted(ordered)


def test_mixture_interleave_upweights_rare_sources(spark, sf_dir):
    from excel_to_db_spark.queries.curation import mixture_interleave

    rows = mixture_interleave(spark, sf_dir).collect()
    n = len(rows)
    assert {r.pos for r in rows} == set(range(1, n + 1))
    counts = {}
    for r in rows:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    rare = min(counts, key=counts.get)
    head = [r for r in rows if r.pos <= n // 5]
    rare_share_head = sum(1 for r in head if r.lang == rare) / len(head)
    rare_share_all = counts[rare] / n
    # sqrt-pacing: the rare source's share of the early stream exceeds
    # its corpus share (that is the point of temperature sampling)
    assert rare_share_head > rare_share_all


def test_text_chunk_dedup_drops_repeats_keeps_order(spark):
    from excel_to_db_spark.queries.curation import text_chunk_dedup

    d = tempfile.mkdtemp(prefix="e2db_chunkdedup_")
    boiler = "one two three four five"
    uniq = "alpha beta gamma delta eps"
    spark.createDataFrame(
        [(1, f"{boiler} {uniq} {boiler}"),   # repeat -> dropped
         (2, f"{uniq} {boiler}")],           # no repeats
        "doc_id bigint, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in text_chunk_dedup(spark, d).collect()}
    assert out[1].n_chunks == 3 and out[1].n_kept == 2
    assert out[2].n_chunks == 2 and out[2].n_kept == 2
    # first-occurrence order preserved: doc1 cleans to boiler + uniq
    import hashlib
    assert out[1].clean_md5 == hashlib.md5(
        f"{boiler} {uniq}".encode()).hexdigest()


def test_join_bloom_pruned_invariant_to_runtime_filter(spark, sf_dir):
    from excel_to_db_spark.queries.curation import join_bloom_pruned

    key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "true")
        on = {tuple(r) for r in join_bloom_pruned(spark, sf_dir).collect()}
        spark.conf.set(key, "false")
        off = {tuple(r) for r in join_bloom_pruned(spark, sf_dir).collect()}
    finally:
        spark.conf.set(key, orig)
    assert on == off and on


def test_bitmap_rollup_equals_direct_distinct(spark, sf_dir):
    """The bucketed day->week bitmap rollup must equal a direct
    COUNT(DISTINCT) — exactness is the whole point vs the HLL sibling.
    (Also guards the bucket-key regression: ids 0 and 1 share a bit
    position in different buckets.)"""
    from excel_to_db_spark.queries.quality import bitmap_distinct_rollup

    got = {(r.event_type, str(r.week)): r.n_users
           for r in bitmap_distinct_rollup(spark, sf_dir).collect()}
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {(r.event_type, str(r.week)): r.n for r in
             e.groupBy("event_type",
                       F.date_trunc("week", F.col("ts").cast("timestamp"))
                       .cast("date").alias("week"))
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == exact and got
