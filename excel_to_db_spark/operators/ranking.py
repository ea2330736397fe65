"""Distributed global ranking — the scale-safe replacement for an
unpartitioned row_number() window (which funnels every row through ONE
partition in Spark's WindowExec).

Same scan-then-offset design as the prefix sum in
queries/pipeline.py:sample_pps_systematic: exact percentile boundaries
range-bucket the rows by value (every tie of a given value lands in one
bucket, so bucket order respects global value order), each bucket ranks
locally in parallel, and the n_buckets-row count table turns into
broadcastable prefix offsets. rank = bucket offset + local rank —
bit-identical to the naive single-partition window (property-tested in
tests/test_stats_r4.py) with no single-task cliff at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def distributed_rank(df: DataFrame, value_col: str, tiebreak_col: str,
                     rank_col: str = "rr", n_buckets: int = 16) -> DataFrame:
    """Append a global 1-based row_number over (value_col, tiebreak_col)
    ascending, computed without a single-partition window. Ties on
    (value, tiebreak) get arbitrary but consistent consecutive ranks,
    exactly like row_number. The input columns pass through."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    b = df.agg(F.percentile(value_col, qs).alias("bs"))
    # NULL values get a dedicated bucket BEFORE all real buckets
    # (percentile ignores NULLs, and NULL > x folds to a NULL bucket
    # that an equi-join would silently drop): ascending Spark windows
    # order NULLs first, so bucket -1 keeps the operator bit-identical
    # to the single-partition formulation on NULL-containing input.
    bucketed = (df.crossJoin(F.broadcast(b))
                .withColumn(
                    "_bkt",
                    F.when(F.col(value_col).isNull(), F.lit(-1))
                    .otherwise(
                        F.aggregate("bs", F.lit(0),
                                    lambda acc, x:
                                    acc + (F.col(value_col) > x)
                                    .cast("int"))))
                .drop("bs"))
    wloc = W.partitionBy("_bkt").orderBy(value_col, tiebreak_col)
    loc = bucketed.withColumn("_lr",
                              F.row_number().over(wloc).cast("bigint"))
    cnts = bucketed.groupBy("_bkt").agg(F.count("*").alias("_c"))
    woff = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = cnts.select("_bkt",
                       F.coalesce(F.sum("_c").over(woff), F.lit(0))
                       .alias("_off"))
    return (loc.join(F.broadcast(offs), "_bkt")
            .withColumn(rank_col, F.col("_off") + F.col("_lr"))
            .drop("_bkt", "_lr", "_off"))


def distributed_prefix_sum(df: DataFrame, order_col: str, sum_col,
                           out_col="prefix",
                           n_buckets: int = 16) -> DataFrame:
    """Append the EXCLUSIVE prefix sum of `sum_col` over `order_col`
    ascending — the same two-phase bucket design as distributed_rank.
    Requires `order_col` values to be unique (group/aggregate first):
    with duplicates an exclusive prefix is ill-defined.

    `sum_col`/`out_col` may be lists of equal length: every column's
    prefix is accumulated in the SAME bucketing/window/offset pass —
    one percentile scan, one window shuffle, one broadcast join total
    (a caller looping per column pays the whole pipeline each time;
    found by review on stats_ks_two_sample)."""
    sum_cols = [sum_col] if isinstance(sum_col, str) else list(sum_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(sum_cols) != len(out_cols):
        raise ValueError("sum_col and out_col lengths differ")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    b = df.agg(F.percentile(order_col, qs).alias("bs"))
    # NULL order keys -> dedicated bucket -1 (nulls-first, matching an
    # ascending window), instead of a NULL bucket the join would drop.
    bucketed = (df.crossJoin(F.broadcast(b))
                .withColumn(
                    "_bkt",
                    F.when(F.col(order_col).isNull(), F.lit(-1))
                    .otherwise(
                        F.aggregate("bs", F.lit(0),
                                    lambda acc, x:
                                    acc + (F.col(order_col) > x)
                                    .cast("int"))))
                .drop("bs"))
    wloc = (W.partitionBy("_bkt").orderBy(order_col)
            .rowsBetween(W.unboundedPreceding, -1))
    loc = bucketed
    for sc, i in zip(sum_cols, range(len(sum_cols))):
        loc = loc.withColumn(
            f"_lp{i}", F.coalesce(F.sum(sc).over(wloc), F.lit(0)))
    tots = bucketed.groupBy("_bkt").agg(
        *[F.sum(sc).alias(f"_t{i}") for i, sc in enumerate(sum_cols)])
    woff = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = tots.select("_bkt", *[
        F.coalesce(F.sum(f"_t{i}").over(woff), F.lit(0)).alias(f"_off{i}")
        for i in range(len(sum_cols))])
    out = loc.join(F.broadcast(offs), "_bkt")
    for i, oc in enumerate(out_cols):
        out = out.withColumn(oc, F.col(f"_off{i}") + F.col(f"_lp{i}"))
    return out.drop("_bkt", *[f"_lp{i}" for i in range(len(sum_cols))],
                    *[f"_off{i}" for i in range(len(sum_cols))])
