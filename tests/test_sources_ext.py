"""New source/sink round trips (queries/sources_ext.py) and sketch
quality operators: XML, binaryFile, text lines, foreachBatch sink,
minhash estimation, ANN recall."""

from __future__ import annotations

import duckdb

from excel_to_db_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _oracle_rows(key: str):
    con = duckdb.connect()
    for t in ("orders", "documents", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    cur = con.execute(REGISTRY[key].oracle)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _spark_rows(spark, key: str):
    df = REGISTRY[key].fn(spark, SF)
    return df.columns, [tuple(r) for r in df.collect()]


def _assert_matches(spark, key: str):
    s_cols, s_rows = _spark_rows(spark, key)
    d_cols, d_rows = _oracle_rows(key)
    assert sorted(s_cols) == sorted(d_cols)
    s_idx = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    canon_s = sorted(tuple(str(r[i]) for i in s_idx) for r in s_rows)
    canon_d = sorted(tuple(str(r[i]) for i in d_idx) for r in d_rows)
    assert canon_s == canon_d


def test_xml_roundtrip_matches_oracle(spark):
    _assert_matches(spark, "xml_roundtrip")


def test_binaryfile_ingest_checksums(spark):
    _assert_matches(spark, "multimodal_binary_ingest")


def test_text_source_lines(spark):
    _assert_matches(spark, "text_source_lines")


def test_foreachbatch_sink_idempotent_epochs(spark):
    _assert_matches(spark, "stream_foreachbatch")


def test_minhash_estimate_tracks_exact_jaccard(spark):
    cols, rows = _spark_rows(spark, "dedup_minhash_est")
    assert rows, "expected verified near-dup pairs in the corpus"
    j = dict(zip(cols, zip(*rows)))
    for exact, est in zip(j["jaccard"], j["est_jaccard"]):
        assert 0.0 <= est <= 1.0
        # 64 components: sd ~ sqrt(j(1-j)/64) < 0.0625; allow 4 sd
        assert abs(est - exact) < 0.25
    _assert_matches(spark, "dedup_minhash_est")


def test_similarity_recall_bounded(spark):
    cols, rows = _spark_rows(spark, "similarity_recall")
    assert rows
    i_hits, i_rec = cols.index("n_hits"), cols.index("recall")
    for r in rows:
        assert 0 <= r[i_hits] <= 10
        assert 0.0 <= r[i_rec] <= 1.0
    _assert_matches(spark, "similarity_recall")


def test_json_malformed_handling(spark):
    _assert_matches(spark, "json_malformed_handling")


def test_asof_tolerance_nulls_out_of_window(spark):
    _assert_matches_tables(spark, "join_asof_tolerance", ("events",))


def _assert_matches_tables(spark, key, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    cur = con.execute(REGISTRY[key].oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    s_cols, s_rows = _spark_rows(spark, key)
    assert sorted(s_cols) == sorted(d_cols)
    s_idx = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    assert sorted(tuple(str(r[i]) for i in s_idx) for r in s_rows) == \
           sorted(tuple(str(r[i]) for i in d_idx) for r in d_rows)


def test_variant_json(spark):
    _assert_matches_tables(spark, "variant_json", ("events",))


def test_state_store_reader_matches_batch(spark):
    _assert_matches_tables(spark, "stream_state_inspect", ("events",))
