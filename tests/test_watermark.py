"""Watermark semantics: late data beyond the watermark is dropped.

Two parquet files replayed one-per-micro-batch: batch 1 advances the
watermark far past an old window; batch 2 delivers a straggler into that
window. In append mode with a 10-minute watermark the straggler must be
DROPPED — the state for its window was already finalized and evicted.
This is the semantics that bounds state at unbounded input; the other
streaming tests (complete-mode equality with batch) can't observe it.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StructField, StructType,
                               TimestampType)

SCHEMA = StructType([StructField("ts", TimestampType()),
                     StructField("value", DoubleType())])

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, rows, path, mtime):
    # a real single FILE (pyarrow), not a Spark output directory — the
    # file stream source lists plain files under the load path
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"ts": pa.array([r[0] for r in rows],
                                 type=pa.timestamp("us")),
                  "value": pa.array([r[1] for r in rows],
                                    type=pa.float64())}),
        path)
    # FileStreamSource orders files by modification time in MILLISECONDS;
    # three sub-millisecond writes can collide and replay out of order,
    # which breaks the batch sequencing this test depends on. Pin
    # strictly increasing mtimes so batch order is deterministic.
    os.utime(path, (mtime, mtime))


def test_late_event_dropped_by_watermark(spark, tmp_path):
    import time

    src = str(tmp_path / "stream_src")
    (tmp_path / "stream_src").mkdir()
    base_mtime = time.time() - 10
    # Drop of too-late data is guaranteed only once the window's state
    # was EVICTED in an earlier batch (a straggler arriving in the same
    # batch that finalizes its window may still merge — documented
    # best-effort). Hence three single-file batches:
    # batch 1 ('a'): window [00:00, 00:10) gets 2 events; an event at
    # 01:00 will push the watermark to 00:50 after this batch
    _write(spark, [(T0 + dt.timedelta(minutes=1), 1.0),
                   (T0 + dt.timedelta(minutes=2), 1.0),
                   (T0 + dt.timedelta(minutes=60), 1.0)],
           src + "/a.parquet", base_mtime)
    # batch 2 ('b'): runs with watermark 00:50 -> finalizes + evicts the
    # first window (emitted with n=2)
    _write(spark, [(T0 + dt.timedelta(minutes=61), 1.0)],
           src + "/b.parquet", base_mtime + 2)
    # batch 3 ('c'): a straggler back into the evicted window — must be
    # dropped (its window is final; append mode can never re-emit it)
    _write(spark, [(T0 + dt.timedelta(minutes=3), 100.0),
                   (T0 + dt.timedelta(minutes=62), 1.0)],
           src + "/c.parquet", base_mtime + 4)

    stream = (spark.readStream.schema(SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", "1").load(src))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "10 minutes").alias("win"))
           .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
           .select(F.col("win.start").alias("ws"), "n", "s"))
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("wm_test").trigger(availableNow=True).start())
    q.awaitTermination()
    out = {r.ws: (r.n, r.s) for r in spark.table("wm_test").collect()}

    first = out.get(T0)
    assert first is not None, f"first window never finalized: {out}"
    n, s = first
    assert n == 2 and s == 2.0, (
        f"straggler leaked into finalized window: {first}")
