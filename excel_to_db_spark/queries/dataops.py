"""Data-engineering ops pack (round 6, batch 73). The reference engine
(294 LoC of Rust delegating to SQLite, reference src/main.rs) has no
operational planning surface; these are Tier-C mission operators — the
four pre-flight computations a 100 TB lakehouse pipeline runs ABOUT
its own data before touching it, each exact-integer:

- ops_compaction_plan: the small-files problem — monthly order
  "files" (rows x pinned 64-byte width) packed into target-size
  compaction groups by next-fit running-total bucketing (cumulative
  bytes // target); reports per-group fill. The plan every
  OPTIMIZE/compaction job derives.
- ops_partition_skew: shuffle-skew pre-flight — rows per candidate
  partition key (month x order priority), max/median/p99 by exact
  rank, skew ratio in micros. The number that decides salting
  (`join_skew_salted`) before the job runs, not after it dies.
- ops_incremental_plan: watermark-based incremental-load planner —
  days beyond the loaded watermark split into <= 2000-row batches by
  cumulative-count bucketing; per-batch day range + row count. The
  backfill chunking every CDC/catch-up job needs.
- ops_bloom_sizing: Bloom-filter sizing from measured NDVs — bits =
  ceil(n * 9.585) for 1% FPR (the -ln(p)/ln(2)^2 constant
  precomputed in Python as 9585 milli — no runtime logs), k = 7
  hashes, for the three join-key columns the repo's bloom-pruned
  join (`join_bloom_pruned`) would build against.

Scale shapes: every key aggregates the corpus once into a bounded
planning table (months / partition keys / days / 3 columns) and does
all planning arithmetic on that tiny table — planning cost must never
scale with the data being planned."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .relational import T

_ROW_BYTES = 64
_TARGET = 256 * 1024          # compaction target: 256 KiB
_BATCH_ROWS = 2000
_BLOOM_MILLI_PER_KEY = 9585   # -ln(0.01)/ln(2)^2 = 9.585, pinned
_SPLIT = 1920                 # loaded watermark (forecast pack split)


@query("ops_compaction_plan", oracle=f"""
    WITH files AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
               count(*) * {_ROW_BYTES} AS bytes
        FROM orders GROUP BY 1
    ),
    packed AS (
        SELECT mo, bytes,
               CAST(coalesce(sum(bytes) OVER (ORDER BY mo
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) // {_TARGET} AS BIGINT)
                   AS grp
        FROM files
    )
    SELECT grp, count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST(sum(bytes) * 1000000 // {_TARGET} AS BIGINT)
               AS fill_micro
    FROM packed GROUP BY grp ORDER BY grp
""")
def ops_compaction_plan(spark, sf_dir):
    """Small-file compaction planning: monthly order files (row count
    x pinned 64-byte width) packed next-fit — group = cumulative
    bytes-before // 256 KiB, a single running-sum window over the
    bounded month table — and reported with per-group fill against
    the target. Planning arithmetic runs on #months rows no matter
    the corpus size; only the initial per-month count touches the
    fact table (map-side combinable)."""
    o = T(spark, sf_dir, "orders")
    files = (o.groupBy(F.date_trunc("month",
                                    F.col("o_orderdate").cast("date"))
                       .alias("mo"))
             .agg((F.count("*") * _ROW_BYTES).alias("bytes")))
    wp = (Window.orderBy("mo")
          .rowsBetween(Window.unboundedPreceding, -1))
    packed = (files
              .withColumn("cum", F.coalesce(F.sum("bytes").over(wp),
                                            F.lit(0)))
              .withColumn("grp", F.expr(f"cum div {_TARGET}")
                          .cast("bigint")))
    return (packed.groupBy("grp")
            .agg(F.count("*").alias("n_files"),
                 F.sum("bytes").cast("bigint").alias("bytes"))
            .select("grp", "n_files", "bytes",
                    F.expr(f"bytes * 1000000 div {_TARGET}")
                    .alias("fill_micro"))
            .orderBy("grp"))


_SKEW_ORACLE = """
    WITH parts AS (
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mo,
               o_orderpriority AS prio, count(*) AS n
        FROM orders GROUP BY 1, 2
    ),
    ranked AS MATERIALIZED (
        SELECT n, row_number() OVER (ORDER BY n, mo, prio) AS rn,
               count(*) OVER () AS np
        FROM parts
    )
    SELECT max(np) AS n_partitions,
           CAST(sum(n) AS BIGINT) AS total_rows,
           max(n) AS max_rows,
           CAST(max(CASE WHEN rn = (np + 1) // 2 THEN n END) AS BIGINT)
               AS median_rows,
           CAST(max(CASE WHEN rn = (np * 99 + 99) // 100 THEN n END)
                AS BIGINT) AS p99_rows,
           CAST(max(n) * 1000000
                // max(CASE WHEN rn = (np + 1) // 2 THEN n END)
                AS BIGINT) AS skew_ratio_micro
    FROM ranked
"""


def skew_parts(df):
    """orders (batch or stream) -> per-(month, priority) row counts —
    the census the streaming monitor maintains incrementally."""
    return (df.groupBy(F.date_trunc("month",
                                    F.col("o_orderdate").cast("date"))
                       .alias("mo"),
                       F.col("o_orderpriority").alias("prio"))
            .agg(F.count("*").alias("n")))


def skew_report(parts):
    """Partition census -> one-row skew report (exact-rank median/p99,
    max/median micro ratio). Runs on the bounded key table."""
    wr = Window.orderBy("n", "mo", "prio")
    np_ = parts.count()
    ranked = parts.select("n", F.row_number().over(wr).alias("rn"))
    med_rn = (np_ + 1) // 2
    p99_rn = (np_ * 99 + 99) // 100
    return ranked.agg(
        F.lit(np_).cast("bigint").alias("n_partitions"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.max("n").alias("max_rows"),
        F.max(F.when(F.col("rn") == med_rn, F.col("n"))).cast("bigint")
        .alias("median_rows"),
        F.max(F.when(F.col("rn") == p99_rn, F.col("n"))).cast("bigint")
        .alias("p99_rows"),
        F.expr(f"max(n) * 1000000"
               f" div max(CASE WHEN rn = {med_rn} THEN n END)")
        .cast("bigint").alias("skew_ratio_micro"))


@query("ops_partition_skew", oracle=_SKEW_ORACLE)
def ops_partition_skew(spark, sf_dir):
    """Shuffle-skew pre-flight for a candidate partitioning (month x
    order priority): per-key row counts, then max / exact-rank median
    / exact-rank p99 and the max-to-median skew ratio in micros — the
    one number that decides whether the downstream join salts its
    keys (`join_skew_salted`) BEFORE the shuffle runs. Rank window is
    over the bounded partition-key table."""
    o = T(spark, sf_dir, "orders")
    return skew_report(skew_parts(o))


@query("ops_incremental_plan", oracle=f"""
    WITH days AS (
        SELECT datediff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS day,
               count(*) AS n
        FROM orders GROUP BY 1
        HAVING datediff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) >= {_SPLIT}
    ),
    packed AS (
        SELECT day, n,
               CAST(coalesce(sum(n) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) // {_BATCH_ROWS} AS BIGINT)
                   AS batch
        FROM days
    )
    SELECT batch, CAST(min(day) AS BIGINT) AS day_from,
           CAST(max(day) AS BIGINT) AS day_to,
           count(*) AS n_days, CAST(sum(n) AS BIGINT) AS n_rows
    FROM packed GROUP BY batch ORDER BY batch
""")
def ops_incremental_plan(spark, sf_dir):
    """Incremental-load planning past the loaded watermark (day 1920):
    unloaded days split into ~2000-row batches by cumulative-count
    next-fit bucketing (whole days never split — the idempotent-retry
    unit), each batch reported with its day range and row count. One
    per-day aggregate (partition-prunable to day >= watermark when the
    table is date-partitioned) + one running-sum window over the
    bounded day table."""
    o = T(spark, sf_dir, "orders")
    days = (o.select(F.datediff(F.col("o_orderdate").cast("date"),
                                F.lit("1995-01-01").cast("date"))
                     .alias("day"))
            .where(F.col("day") >= _SPLIT)
            .groupBy("day").agg(F.count("*").alias("n")))
    wp = (Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1))
    packed = (days
              .withColumn("cum", F.coalesce(F.sum("n").over(wp),
                                            F.lit(0)))
              .withColumn("batch", F.expr(f"cum div {_BATCH_ROWS}")
                          .cast("bigint")))
    return (packed.groupBy("batch")
            .agg(F.min("day").cast("bigint").alias("day_from"),
                 F.max("day").cast("bigint").alias("day_to"),
                 F.count("*").alias("n_days"),
                 F.sum("n").cast("bigint").alias("n_rows"))
            .orderBy("batch"))


@query("ops_bloom_sizing", oracle=f"""
    WITH ndvs AS (
        SELECT 'orders.o_custkey' AS keycol,
               count(DISTINCT o_custkey) AS ndv FROM orders
        UNION ALL
        SELECT 'lineitem.l_partkey',
               count(DISTINCT l_partkey) FROM lineitem
        UNION ALL
        SELECT 'events.user_id',
               count(DISTINCT user_id) FROM events
    )
    SELECT keycol, CAST(ndv AS BIGINT) AS ndv,
           (CAST(ndv AS BIGINT) * {_BLOOM_MILLI_PER_KEY} + 999)
             // 1000 AS bits,
           ((CAST(ndv AS BIGINT) * {_BLOOM_MILLI_PER_KEY} + 999)
             // 1000 + 7) // 8 AS bytes,
           7 AS k_hashes
    FROM ndvs
""")
def ops_bloom_sizing(spark, sf_dir):
    """Bloom-filter sizing from measured NDVs for the three join keys
    the bloom-pruned join would build against: bits = ceil(ndv *
    9.585) for 1% FPR — the -ln(p)/ln(2)^2 constant precomputed in
    Python as a 9585-milli literal, so no runtime log ever runs — and
    the optimal k = round(bits/n * ln 2) = 7 pinned with it. Three
    exact-distinct aggregates; the sizing arithmetic is 3 rows."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    ev = T(spark, sf_dir, "events")

    def one(df, col, name):
        return (df.agg(F.countDistinct(col).alias("ndv"))
                .select(F.lit(name).alias("keycol"),
                        F.col("ndv").cast("bigint").alias("ndv")))

    ndvs = (one(o, "o_custkey", "orders.o_custkey")
            .unionByName(one(li, "l_partkey", "lineitem.l_partkey"))
            .unionByName(one(ev, "user_id", "events.user_id")))
    return ndvs.select(
        "keycol", "ndv",
        F.expr(f"(ndv * {_BLOOM_MILLI_PER_KEY} + 999) div 1000")
        .alias("bits"),
        F.expr(f"((ndv * {_BLOOM_MILLI_PER_KEY} + 999) div 1000 + 7)"
               f" div 8").alias("bytes"),
        F.lit(7).alias("k_hashes"))
