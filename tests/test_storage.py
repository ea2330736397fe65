"""Storage-layout queries: bucketed join plan shape, format round trips,
and the stream-stream interval join vs its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_pair_is_exchange_free(spark, sf_dir):
    """The registered join_bucketed query's join subtree must be a
    SortMergeJoin with no Exchange on either side (co-located buckets)."""
    from excel_to_db_spark.queries.storage import bucketed_join_pair

    j = bucketed_join_pair(spark, sf_dir)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan[plan.index("SortMergeJoin"):]


def test_excel_roundtrip_lossless(spark, sf_dir):
    from excel_to_db_spark.queries.storage import excel_roundtrip

    back = excel_roundtrip(spark, sf_dir)
    orig = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderkey") % 500 == 0)
            .select("o_orderkey", "o_orderstatus",
                    F.round("o_totalprice", 2).alias("price")))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Finite replay through the symmetric stream-stream join emits
    exactly the batch interval-join pairs."""
    from excel_to_db_spark.streaming import run_stream_stream_join
    from excel_to_db_spark.tables import load_table

    e = load_table(spark, sf_dir, "events")
    c = (e.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("cu"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("cts")))
    v = (e.filter(F.col("event_type") == "view")
         .select(F.col("user_id").alias("vu"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("vts")))
    # sf0.001 is sparse: no click->view pair lands within 10 min, so the
    # test widens the interval (the registered query keeps 10 min, which
    # has matches at the driver's sf0.01).
    batch = (c.join(v, (F.col("cu") == F.col("vu"))
                    & (F.col("vts") > F.col("cts"))
                    & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 120 MINUTES")))
             .select(F.col("cu").alias("user_id"), "click_id", "view_id",
                     (F.unix_micros("vts") - F.unix_micros("cts")).alias("delay_us")))
    streamed = run_stream_stream_join(spark, sf_dir, within="120 minutes")
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))
    assert streamed.count() > 0


def test_python_replay_source_incremental_and_exact(spark, sf_dir):
    """The custom Python streaming source must replay in MULTIPLE
    micro-batches (row-offset incrementality) and still aggregate to
    exactly the batch GROUP BY."""
    from excel_to_db_spark.sources.replay_stream import run_replay_source_agg
    from pyspark.sql import functions as F

    out = run_replay_source_agg(spark, sf_dir, batch_rows=700)
    batch = (spark.read.parquet(f"{sf_dir}/events.parquet")
             .groupBy("event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum("value"), 2).alias("sum_value")))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_csv_commitlog_sink_ignores_uncommitted_stragglers(spark, sf_dir):
    """Files staged under _data but never named by a commit log (a
    failed attempt's leftovers) must be invisible to readers."""
    import tempfile

    from pyspark.sql import functions as F

    from excel_to_db_spark.sources.stream_sink import (CsvCommitLogDataSource,
                                                       read_committed)
    from excel_to_db_spark.streaming import events_stream_reader

    spark.dataSource.register(CsvCommitLogDataSource)
    out = tempfile.mkdtemp(prefix="csvlog_t_")
    ckpt = tempfile.mkdtemp(prefix="csvlog_t_ckpt_")
    q = (events_stream_reader(spark, sf_dir)
         .select("event_id", "event_type", "value")
         .writeStream.format("csv_commitlog")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    with open(f"{out}/_data/deadbeef-p9.csv", "w") as fh:
        fh.write("999999,orphan,1000000.0\n")  # straggler, never committed

    back = read_committed(spark, out,
                          "event_id bigint, event_type string, value double")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert back.count() == n_events
    assert back.filter(F.col("event_type") == "orphan").count() == 0


def test_dynamic_overwrite_leaves_other_partitions_untouched(spark, sf_dir):
    """partitionOverwriteMode=dynamic must replace ONLY the partitions
    present in the incoming frame: every other partition directory keeps
    byte-identical files."""
    import hashlib
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="e2db_dpo_test_")
    base = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id", "user_id", "value", "event_type"))
    base.write.partitionBy("event_type").mode("overwrite").parquet(out)

    def digest(part):
        d = os.path.join(out, f"event_type={part}")
        h = hashlib.md5()
        for f in sorted(os.listdir(d)):
            if not f.startswith("."):
                h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    before = {p: digest(p) for p in ("view", "purchase", "error", "signup")}
    (base.filter(F.col("event_type") == "click")
     .withColumn("value", F.col("value") * 2)
     .write.partitionBy("event_type")
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite").parquet(out))
    after = {p: digest(p) for p in before}
    assert after == before
    # and the click partition did change content
    n_click = (spark.read.parquet(out)
               .filter(F.col("event_type") == "click").count())
    n_orig = base.filter(F.col("event_type") == "click").count()
    assert n_click == n_orig
