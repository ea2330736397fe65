"""Witness for text_compression_quality: the distributed kernel's
sizes must equal direct zlib calls on the same parquet, and the top-20
selection must match the exact ratio ordering."""

from __future__ import annotations

import zlib

import pyarrow.parquet as pq


def test_compression_sizes_exact(spark, sf_dir):
    from excel_to_db_spark.queries.quality import text_compression_quality

    tb = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"])
    expect = {}
    for did, text in zip(tb.column("doc_id").to_pylist(),
                         tb.column("text").to_pylist()):
        raw = len(text.encode("utf-8"))
        if raw > 0:
            expect[did] = (raw, len(zlib.compress(text.encode("utf-8"), 6)))
    top = sorted(expect.items(),
                 key=lambda kv: (kv[1][1] / kv[1][0], kv[0]))[:20]
    got = text_compression_quality(spark, sf_dir).collect()
    assert len(got) == 20
    for row, (did, (raw, comp)) in zip(got, top):
        assert (row["doc_id"], row["raw_bytes"], row["zlib_bytes"]) \
            == (did, raw, comp)
