"""Multimodal plumbing: payload columns, stubbed decode, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from excel_to_db_spark.operators import multimodal as M


def _docs(spark):
    return spark.createDataFrame(
        [(0, "x" * 40), (1, "y" * 10), (2, "")], ["doc_id", "text"])


def test_with_payload_schema(spark):
    df = M.with_payload(_docs(spark))
    kinds = dict(df.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_meta"].startswith("struct<")
    [r] = df.filter(F.col("doc_id") == 0).select("media_meta.n_bytes").collect()
    assert r.n_bytes == 40


def test_decode_images_stub_and_nulls(spark):
    out = {r.doc_id: r for r in
           M.decode_images(M.with_payload(_docs(spark))).collect()}
    r0 = out[0]
    assert (r0.width, r0.height, r0.n_channels) == (64 + 40 % 577,
                                                    64 + (40 * 31) % 389, 3)
    # empty payload -> permissive NULLs, not a task failure
    assert (out[2].width, out[2].height, out[2].n_channels) == (None, None, None)
    assert out[2].n_bytes == 0


def test_sample_frames_indices(spark):
    # 40 bytes / 16 per frame -> 2 frames; every_k=1 samples both
    df = M.sample_frames(M.with_payload(_docs(spark)), every_k=1, frame_bytes=16)
    rows = [(r.doc_id, r.frame_idx) for r in df.collect()]
    assert sorted(rows) == [(0, 0), (0, 1)]   # doc1 too short, doc2 empty
