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


def test_replay_source_restart_adopts_committed_offset(tmp_path):
    """A re-created events_replay reader starts with _pos = 0 while the
    engine replans from the committed offset log. partitions() must
    adopt the engine's start (no inverted ranges / negative pyarrow
    slices) and latestOffset() must never run behind it again."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from excel_to_db_spark.sources.replay_stream import \
        EventsReplayStreamReader

    path = str(tmp_path / "events.parquet")
    n = 500
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array([T0] * n, type=pa.timestamp("us")),
        "user_id": pa.array([1] * n, type=pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    }), path)

    # fresh reader, engine-committed offset already at row 300
    r = EventsReplayStreamReader({"path": path, "batch_rows": "100"})
    assert r.partitions({"row": 300}, {"row": 300}) == []  # no-op replan
    off = r.latestOffset()
    assert off["row"] >= 300  # adopted: never behind the committed start
    parts = r.partitions({"row": 300}, off)
    rows = [b.num_rows for p in parts for b in r.read(p)]
    assert sum(rows) == off["row"] - 300

    # unfinished-batch replan (start < end, both behind a stale _pos)
    r2 = EventsReplayStreamReader({"path": path, "batch_rows": "100"})
    parts = r2.partitions({"row": 100}, {"row": 200})
    assert sum(b.num_rows for p in parts for b in r2.read(p)) == 100
    assert r2.latestOffset()["row"] >= 200


def test_replay_source_engine_restart(spark, tmp_path):
    """Engine-level restart: drain the replay source under a checkpoint,
    stop, start a NEW query from the same checkpoint — the re-created
    reader must come up cleanly (pre-fix: crash or garbage ranges) and
    add nothing on the already-drained input."""
    import uuid

    from pyspark.sql import functions as F

    from excel_to_db_spark.sources.replay_stream import \
        EventsReplayDataSource

    sf = "/root/testdata/sf0.001"
    spark.dataSource.register(EventsReplayDataSource)
    ckpt = str(tmp_path / "ckpt")
    name = f"replay_restart_{uuid.uuid4().hex[:8]}"

    def start(qname):
        stream = (spark.readStream.format("events_replay")
                  .option("path", f"{sf}/events.parquet")
                  .option("batch_rows", "512").load())
        return (stream.groupBy("event_type")
                .agg(F.count("*").alias("n"))
                .writeStream.outputMode("complete")
                .format("memory").queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="0 seconds")
                .start())

    import pyarrow.parquet as pq
    total = pq.ParquetFile(f"{sf}/events.parquet").metadata.num_rows

    def drain(q):
        import ast

        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["sources"]:
                end = p["sources"][0].get("endOffset") or {}
                if isinstance(end, str):
                    end = ast.literal_eval(end)
                if end.get("row", 0) >= total:
                    return
            time.sleep(0.2)
        raise TimeoutError("replay stream did not drain")

    q1 = start(name)
    drain(q1)
    q1.stop()
    q1.awaitTermination()
    n1 = spark.table(name).agg(F.sum("n")).collect()[0][0]
    assert n1 == total

    q2 = start(name + "_b")
    try:
        # the restarted reader must replan the committed offset without
        # crashing; give it a few micro-batch cycles
        time.sleep(3.0)
        assert q2.exception() is None
    finally:
        q2.stop()
        q2.awaitTermination()
