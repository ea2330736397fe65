"""Round-4 late plan/property guards: the BPE trainer's shuffle
discipline, the equi-depth histogram's no-global-sort shape, the
pandas UDAF's two-phase aggregate, and repartitionByRange producing a
RangePartitioning exchange (the production path the histogram's exact
quantiles stand in for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from excel_to_db_spark.queries.storage import range_partition_histogram
from excel_to_db_spark.queries.functions import udaf_grouped_pandas
from excel_to_db_spark.queries.tokenizer import _pair_counts, _word_reprs


def test_range_histogram_has_no_global_sort(spark, sf_dir):
    """Equi-depth boundaries must come from an aggregate, not a global
    sort: no Sort with a SinglePartition requirement in the plan, and
    the boundary row joins back via broadcast."""
    plan = range_partition_histogram(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Sort " not in plan        # percentile agg, not ntile-over-all
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_repartition_by_range_plans_range_partitioning(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/orders.parquet")
          .repartitionByRange(4, F.col("o_totalprice")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_udaf_plans_two_phase_pandas_aggregate(spark, sf_dir):
    """The GROUPED_AGG pandas UDF must run as AggregateInPandas after
    ONE hash-partitioned exchange on the group key — no driver-side
    grouping, no extra shuffle."""
    plan = udaf_grouped_pandas(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert ("AggregateInPandas" in plan          # Spark <= 4.0 name
            or "ArrowAggregatePython" in plan)   # Spark 4.1 name
    assert plan.lower().count("exchange hashpartitioning") == 1


def test_bpe_pair_count_shuffle_carries_pairs_only(spark, sf_dir):
    """The pair-count aggregate must partial-aggregate map-side (two
    HashAggregates around one Exchange), so the shuffle volume is
    distinct pairs, not exploded corpus positions."""
    pc = _pair_counts(_word_reprs(spark, sf_dir))
    plan = pc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert plan.lower().count("exchange hashpartitioning") <= 2  # words + pairs
