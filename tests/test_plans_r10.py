"""Round-4 Spark-4-surface guards: dynamic partition pruning actually
prunes the partitioned fact scan, parameterized SQL pushes the bound
literal into the parquet scan, and the pandas-on-Spark key stays
distributed (no toPandas materialization in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    from excel_to_db_spark.queries.sql_features import join_dpp_pruned

    df = join_dpp_pruned(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_parameterized_filter_pushed_down(spark, sf_dir):
    from excel_to_db_spark.queries.sql_features import sql_parameterized

    df = sql_parameterized(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The :thr bind must reach the scan as a plain literal pushed filter.
    assert "PushedFilters" in plan
    assert "200000" in plan


def test_pandas_on_spark_is_lazy_distributed(spark, sf_dir):
    from excel_to_db_spark.queries.sql_features import pandas_on_spark_agg

    df = pandas_on_spark_agg(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan          # ordinary two-phase agg
    assert "Scan" in plan                   # reads the parquet, not a
    #                                         local pandas collection


def test_sql_scripting_bisection_equals_percentile(spark, sf_dir):
    """The bisection script's integer median must equal the one-pass
    order-statistic definition."""
    from excel_to_db_spark.queries.sql_features import sql_scripting

    got = sql_scripting(spark, sf_dir).collect()[0][0]
    t = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select(F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("c")))
    n = t.count()
    need = (n + 1) // 2
    want = (t.orderBy("c").limit(need)
            .agg(F.round(F.max("c") / 100.0, 2)).collect()[0][0])
    assert got == want


def test_join_hints_pick_physical_strategy(spark, sf_dir):
    """SHUFFLE_HASH and MERGE hints on the identical logical join must
    produce ShuffledHashJoin and SortMergeJoin respectively — and the
    same rows."""
    from excel_to_db_spark.queries.sql_features import (
        join_hint_shuffle_hash,
    )

    shj = join_hint_shuffle_hash(spark, sf_dir)
    plan = shj._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").hint("merge")
    merged = (o.join(c, o.o_custkey == c.c_custkey)
              .groupBy("c_mktsegment")
              .agg(F.count("*").alias("n_orders"),
                   F.round(F.sum(F.round(F.col("o_totalprice") * 100)
                                 .cast("bigint")) / 100.0, 2)
                   .alias("sum_price")))
    mplan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in mplan
    assert set(map(tuple, shj.collect())) == set(map(tuple,
                                                     merged.collect()))
