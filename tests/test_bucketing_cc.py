"""Bucketed co-located joins (shuffle elimination) + connected
components + stateful streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """bucketBy on the join key co-locates both sides: the sort-merge
    join plan must contain NO Exchange (shuffle). This is the 100 TB
    fact-fact join strategy — pay the shuffle once at write time, join
    free forever after."""
    from excel_to_db_spark.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    (orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("orders_b"))
    (lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("lineitem_b"))
    j = (spark.table("lineitem_b")
         .join(spark.table("orders_b"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("q")))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the join itself must be exchange-free; the final small agg may
    # exchange, so inspect only the subtree below the join
    join_part = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in join_part
    # and the result matches the plain (shuffling) join
    plain = (lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("q")))
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_dedup_clusters_labels(spark):
    from excel_to_db_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["d1", "d2"])     # {1,2,3} {7,9} {5}
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 7, 9)], ["did"])
    out = {r.doc_id: r.cluster for r in dedup_clusters(pairs, ids).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 9: 7}


def test_stateful_totals_equals_batch(spark, sf_dir):
    from excel_to_db_spark.streaming import run_stateful_totals
    from excel_to_db_spark.tables import load_table

    stream = {(r.user_id, r.n_events, r.sum_value)
              for r in run_stateful_totals(spark, sf_dir).collect()}
    batch = {(r.user_id, r.n_events, r.sum_value)
             for r in (load_table(spark, sf_dir, "events")
                       .groupBy("user_id")
                       .agg(F.count("*").alias("n_events"),
                            F.round(F.sum("value"), 2).alias("sum_value"))
                       ).collect()}
    assert stream == batch


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """write.partitionBy + a partition-key filter: the scan must show a
    partition filter and read only the matching directory — partition
    pruning, the other half of the 100 TB layout story next to bucketing."""
    from excel_to_db_spark.tables import load_table

    out = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy("event_type") \
        .mode("overwrite").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan
    n_click = (load_table(spark, sf_dir, "events")
               .filter(F.col("event_type") == "click").count())
    assert df.count() == n_click
