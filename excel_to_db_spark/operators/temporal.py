"""Temporal/range join operators — semantics Spark has no native join
type for, built as compositions of DataFrame ops (SURVEY.md §2 custom-
operator rule: composition first, Pandas UDF only if impossible).

- `asof_join`: each left row matched to the most recent right row at or
  before its timestamp, per key. Implemented with the union+window
  trick: tag both sides, sort within key by (ts, tag), and carry the
  last right-side timestamp forward with `last(..., ignorenulls=True)`.
  ONE shuffle on the key — the naive correlated-subquery form (which the
  DuckDB oracle uses, because correctness there is what matters) would
  be a per-row rescan.
- `range_join`: join a fact column into contiguous, non-overlapping
  [lo, hi) bands. A BETWEEN theta-join is O(rows x bands) nested-loop;
  when bands are uniform, mapping the value to its band index turns it
  into an equi-join — O(rows). That rewrite is the classic range-join
  optimization (Databricks' range-join hints do the binning internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_ts_alias: str = "asof_ts") -> DataFrame:
    """For every left row: max right.ts <= left.ts within the `on` key
    (NULL when no prior right row). Both inputs must expose `on` + `ts`;
    left's other columns are preserved."""
    lt = left.withColumn("_tag", F.lit(1))
    rt = (right.select(on, ts).withColumn("_tag", F.lit(0))
          .select(*[F.lit(None).cast(t).alias(c) if c not in (on, ts, "_tag")
                    else F.col(c)
                    for c, t in lt.dtypes]))
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal ts (tag 0 < 1), so a
    # right row at exactly left.ts matches — the standard >= asof rule.
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_tag").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.withColumn(
        right_ts_alias,
        F.last(F.when(F.col("_tag") == 0, F.col(ts)), ignorenulls=True).over(w))
    return carried.filter(F.col("_tag") == 1).drop("_tag")


def asof_join_forward(left: DataFrame, right: DataFrame, on: str, ts: str,
                      right_ts_alias: str = "asof_fwd_ts") -> DataFrame:
    """Forward as-of: for every left row, min right.ts >= left.ts within
    the key (NULL when no later right row). Mirror of `asof_join`: same
    union, but left rows sort BEFORE right rows at equal ts (tag desc)
    and the window looks forward — an equal-ts right row still matches
    (inclusive >=). Still ONE shuffle on the key."""
    lt = left.withColumn("_tag", F.lit(1))
    rt = (right.select(on, ts).withColumn("_tag", F.lit(0))
          .select(*[F.lit(None).cast(t).alias(c) if c not in (on, ts, "_tag")
                    else F.col(c)
                    for c, t in lt.dtypes]))
    u = lt.unionByName(rt)
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_tag").desc())
         .rowsBetween(0, Window.unboundedFollowing))
    carried = u.withColumn(
        right_ts_alias,
        F.first(F.when(F.col("_tag") == 0, F.col(ts)), ignorenulls=True).over(w))
    return carried.filter(F.col("_tag") == 1).drop("_tag")


def asof_join_nearest(left: DataFrame, right: DataFrame, on: str, ts: str,
                      back_alias: str = "back_ts",
                      fwd_alias: str = "fwd_ts",
                      nearest_alias: str = "nearest_ts") -> DataFrame:
    """Nearest as-of: both directions carried in ONE pass (one hash
    exchange on the key; the two window sort orders re-sort without
    re-shuffling), then the closer timestamp wins; exact integer
    microsecond distances, ties to the backward match — the pandas
    merge_asof(direction='nearest') contract."""
    lt = left.withColumn("_tag", F.lit(1))
    rt = (right.select(on, ts).withColumn("_tag", F.lit(0))
          .select(*[F.lit(None).cast(t).alias(c) if c not in (on, ts, "_tag")
                    else F.col(c)
                    for c, t in lt.dtypes]))
    u = lt.unionByName(rt)
    right_ts = F.when(F.col("_tag") == 0, F.col(ts))
    wb = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_tag").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_tag").desc())
          .rowsBetween(0, Window.unboundedFollowing))
    carried = (u.withColumn(back_alias,
                            F.last(right_ts, ignorenulls=True).over(wb))
               .withColumn(fwd_alias,
                           F.first(right_ts, ignorenulls=True).over(wf)))
    d_back = F.unix_micros(F.col(ts)) - F.unix_micros(F.col(back_alias))
    d_fwd = F.unix_micros(F.col(fwd_alias)) - F.unix_micros(F.col(ts))
    nearest = (F.when(F.col(back_alias).isNull(), F.col(fwd_alias))
               .when(F.col(fwd_alias).isNull(), F.col(back_alias))
               .when(d_back <= d_fwd, F.col(back_alias))
               .otherwise(F.col(fwd_alias)))
    return (carried.filter(F.col("_tag") == 1).drop("_tag")
            .withColumn(nearest_alias, nearest))


def asof_join_tolerance(left: DataFrame, right: DataFrame, on: str,
                        ts: str, tolerance_us: int,
                        right_ts_alias: str = "asof_ts") -> DataFrame:
    """Backward as-of with a maximum lookback (the pandas
    merge_asof(tolerance=...) contract): a match older than `tolerance`
    microseconds is treated as no match (NULL). Same ONE-shuffle
    union+window plan as `asof_join`; the tolerance is a post-window
    projection, not a join condition — no plan change, no extra pass."""
    out = asof_join(left, right, on, ts, right_ts_alias)
    gap = F.unix_micros(F.col(ts)) - F.unix_micros(F.col(right_ts_alias))
    return out.withColumn(
        right_ts_alias,
        F.when(gap <= tolerance_us, F.col(right_ts_alias)))


def range_join_binned(fact: DataFrame, value_col: str, bands: DataFrame,
                      width: float, how: str = "inner") -> DataFrame:
    """Join `fact.value_col` into uniform contiguous bands
    (bands: band_id, lo, hi with hi-lo == width, lo == band_id*width):
    band index = floor(value/width), then broadcast equi-join. Result is
    identical to `value >= lo AND value < hi` but runs as a hash join."""
    f = fact.withColumn("_bin", F.floor(F.col(value_col) / width).cast("bigint"))
    b = bands.withColumn("_bin", F.floor(F.col("lo") / width).cast("bigint"))
    return (f.join(F.broadcast(b), "_bin", how)
            .drop("_bin"))


def scd2_customer_versions(customer: DataFrame, cut,
                           bump: float = 50.0) -> DataFrame:
    """Synthetic two-version type-2 customer dimension shared by the
    batch (`join_scd2`) and streaming (`stream_scd2_enrich`) SCD2
    operators, so the sentinel validity dates and version semantics
    cannot drift between them: version 1 is valid [1900-01-01, cut),
    version 2 raises every balance by `bump` and is valid
    [cut, 9999-01-01). Columns: c_custkey, c_mktsegment, acctbal,
    valid_from, valid_to, ver."""
    v1 = customer.select(
        "c_custkey", "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("1900-01-01").cast("timestamp").alias("valid_from"),
        cut.alias("valid_to"), F.lit(1).alias("ver"))
    v2 = customer.select(
        "c_custkey", "c_mktsegment",
        F.round(F.col("c_acctbal") + bump, 2).alias("acctbal"),
        cut.alias("valid_from"),
        F.lit("9999-01-01").cast("timestamp").alias("valid_to"),
        F.lit(2).alias("ver"))
    return v1.unionAll(v2)
