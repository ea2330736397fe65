"""Checkpoint recovery: a streaming aggregation stopped and restarted
from its checkpoint must resume exactly — state restored, already-read
files NOT reprocessed (exactly-once over the source), final result equal
to the batch aggregation of everything.

This is the operational property the other streaming tests can't see:
they replay in one run. Production streams restart constantly; the
offset log + state store in the checkpoint directory are what make that
a non-event at 100 TB.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StructField, StructType,
                               TimestampType)

SCHEMA = StructType([StructField("ts", TimestampType()),
                     StructField("value", DoubleType())])

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(rows, path, mtime):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"ts": pa.array([r[0] for r in rows], type=pa.timestamp("us")),
                  "value": pa.array([r[1] for r in rows], type=pa.float64())}),
        path)
    os.utime(path, (mtime, mtime))


def _agg(stream):
    return (stream
            .groupBy(F.window("ts", "10 minutes").alias("win"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .select(F.col("win.start").alias("ws"), "n", "s"))


def _run(spark, src, ckpt, name):
    stream = (spark.readStream.schema(SCHEMA).format("parquet").load(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (_agg(stream)
         .writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "src").mkdir()
    base = time.time() - 10

    batch_a = [(T0 + dt.timedelta(minutes=1), 1.0),
               (T0 + dt.timedelta(minutes=2), 2.0),
               (T0 + dt.timedelta(minutes=11), 4.0)]
    batch_b = [(T0 + dt.timedelta(minutes=3), 8.0),
               (T0 + dt.timedelta(minutes=21), 16.0)]

    # run 1: only file A exists; the query drains it and stops,
    # leaving offsets + window state in the checkpoint
    _write(batch_a, f"{src}/a.parquet", base)
    q1 = _run(spark, src, ckpt, "ckpt_run1")
    rows1 = {(r.ws, r.n, r.s) for r in spark.table("ckpt_run1").collect()}
    assert rows1 == {(T0, 2, 3.0), (T0 + dt.timedelta(minutes=10), 1, 4.0)}

    # run 2: file B arrives; a NEW query restarts from the SAME
    # checkpoint — it must read ONLY B (offset log) yet produce the
    # full A+B aggregation (state store recovery)
    _write(batch_b, f"{src}/b.parquet", base + 2)
    q2 = _run(spark, src, ckpt, "ckpt_run2")
    rows2 = {(r.ws, r.n, r.s) for r in spark.table("ckpt_run2").collect()}
    assert rows2 == {(T0, 3, 11.0),
                     (T0 + dt.timedelta(minutes=10), 1, 4.0),
                     (T0 + dt.timedelta(minutes=20), 1, 16.0)}

    # exactly-once over the source: run 2 ingested B's 2 rows, not A+B
    progress = q2.recentProgress
    assert sum(p["numInputRows"] for p in progress) == len(batch_b)
