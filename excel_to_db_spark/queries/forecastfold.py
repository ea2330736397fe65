"""Smoothing-replay pack (round 6, batch 95). The reference engine
(294 LoC of Rust delegating to SQLite, reference src/main.rs) has none
of this; three Tier-C mission operators that replay exponential-
smoothing forecasters over the order history as ordered integer folds
(the `list_reduce`/`aggregate` machinery from the simreplay pack
applied to model fitting — in-engine backtesting without exporting
the series):

- ts_ses_grid: simple exponential smoothing over the daily order-count
  series, an alpha grid of 9 candidates (100..900 milli) folded in
  parallel; per-alpha final level and one-step-ahead SSE, best alpha
  flagged. Model selection as a 9-row cross join — the fold state is
  two ints, the corpus is collapsed once.
- ts_holt_replay: Holt's linear-trend smoothing (alpha=300, beta=100
  milli) over the same series; final level/trend, SSE, and the h=1..3
  step-ahead forecasts.
- ts_ses_by_key: SES (alpha=300) segmented per customer nation — the
  per-key fold shape that parallelizes by key at any corpus size
  (same segmented scan as ops_token_bucket_replay).

All folds carry BIGINT struct state in milli fixed point; one-step
errors use the PRE-update level (textbook SES/Holt residuals), and
every division is an integer div with identical truncate-toward-zero
semantics on both engines. ENGINE TRAP (pinned rule, see simreplay):
DuckDB's list_reduce evaluates struct_pack fields SEQUENTIALLY, so
each fold orders fields reads-before-writes (sse first, then prev,
then lvl, then trend, then n); the Spark `aggregate` lambda is pure,
so its trend term re-inlines the new-level expression instead of
reading the mutated accumulator. int64 headroom: levels are
count*1000, SSE sums squared milli errors — ~1e13 at sf0.1, ~1e17 at
sf=10; rescale the series (cents -> whole units) beyond that."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .relational import T

_DAILY_SQL = """
    daily AS MATERIALIZED (
        SELECT list(x * 1000 ORDER BY day) AS xs
        FROM (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        )
    )
"""


def _daily_xs(spark, sf_dir):
    """Daily order counts as one milli-scaled array, day-ordered."""
    return (T(spark, sf_dir, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(F.count("*").alias("x"))
            .agg(F.expr("transform(sort_array(collect_list("
                        "struct(day, x))), s -> s.x * 1000)")
                 .alias("xs")))


@query("ts_ses_grid", oracle=f"""
    WITH {_DAILY_SQL},
    grid AS (SELECT unnest([100, 200, 300, 400, 500, 600, 700, 800,
                            900]) AS alpha),
    folded AS MATERIALIZED (
        SELECT CAST(alpha AS BIGINT) AS alpha_milli,
               len(xs) AS n_days,
               list_reduce(
                   list_prepend(
                       struct_pack(sse := CAST(0 AS BIGINT),
                                   lvl := CAST(0 AS BIGINT),
                                   n := CAST(0 AS BIGINT)),
                       list_transform(xs, x -> struct_pack(
                           sse := CAST(0 AS BIGINT),
                           lvl := CAST(x AS BIGINT),
                           n := CAST(0 AS BIGINT)))),
                   (acc, e) -> struct_pack(
                       sse := acc.sse + CASE WHEN acc.n = 0 THEN 0
                              ELSE (e.lvl - acc.lvl)
                                   * (e.lvl - acc.lvl) END,
                       lvl := CASE WHEN acc.n = 0 THEN e.lvl
                              ELSE acc.lvl + (alpha * (e.lvl - acc.lvl))
                                   // 1000 END,
                       n := acc.n + 1)) AS st
        FROM grid CROSS JOIN daily
    )
    SELECT alpha_milli, CAST(n_days AS BIGINT) AS n_days,
           st.sse AS sse_milli2, st.lvl AS final_level_milli,
           CAST(CASE WHEN row_number() OVER (ORDER BY st.sse,
                alpha_milli) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS is_best
    FROM folded
""")
def ts_ses_grid(spark, sf_dir):
    """SES backtest over an alpha grid: the daily order-count series
    (milli fixed point) folded once per candidate alpha in
    {100..900}; each fold reports the final level and the one-step-
    ahead SSE against the PRE-update level (the textbook residual),
    and the minimum-SSE alpha is flagged. The corpus collapses to ONE
    bounded array; the 9 folds are a 9-row cross join — grid search
    costs 9x a 2,405-element in-memory scan, nothing at fact scale."""
    grid = spark.range(1, 10).select(
        (F.col("id") * 100).cast("bigint").alias("alpha_milli"))
    fold = ("aggregate(xs,"
            " named_struct('sse', CAST(0 AS BIGINT),"
            " 'lvl', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT)),"
            " (acc, x) -> named_struct("
            " 'sse', acc.sse + CASE WHEN acc.n = 0 THEN 0"
            " ELSE (x - acc.lvl) * (x - acc.lvl) END,"
            " 'lvl', CASE WHEN acc.n = 0 THEN x"
            " ELSE acc.lvl + (alpha_milli * (x - acc.lvl)) div 1000 END,"
            " 'n', acc.n + 1))")
    folded = (grid.crossJoin(F.broadcast(_daily_xs(spark, sf_dir)))
              .select("alpha_milli",
                      F.expr("size(xs)").cast("bigint").alias("n_days"),
                      F.expr(fold).alias("st")))
    w = Window.orderBy("sse_milli2", "alpha_milli")
    return (folded.select(
        "alpha_milli", "n_days",
        F.col("st.sse").alias("sse_milli2"),
        F.col("st.lvl").alias("final_level_milli"))
        .withColumn("is_best",
                    F.when(F.row_number().over(w) == 1, 1)
                    .otherwise(0).cast("bigint")))


@query("ts_holt_replay", oracle="""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT list(x * 1000 ORDER BY day) AS xs
        FROM (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        )
    ),
    -- ENGINE TRAP (pinned, extends the simreplay rule): DuckDB 1.0's
    -- list_reduce CORRUPTS struct folds where a reassigned field is
    -- read by another field whose own update depends on the
    -- accumulator (lazy expression inlining yields values matching
    -- NEITHER pure nor any sequential-mutation order — probed
    -- exhaustively). Coupled-state folds therefore use WITH RECURSIVE
    -- (pure by construction, 1-row working table); list_reduce stays
    -- safe only for the shapes proven green (each read field is
    -- either self-updated or element-only, e.g. the token bucket).
    fold AS (
        SELECT 0 AS i, CAST(0 AS BIGINT) AS sse,
               CAST(0 AS BIGINT) AS lvl, CAST(0 AS BIGINT) AS trend
        UNION ALL
        SELECT i + 1,
               sse + CASE WHEN i = 0 THEN 0
                     ELSE (xs[i + 1] - lvl - trend)
                          * (xs[i + 1] - lvl - trend) END,
               CASE WHEN i = 0 THEN xs[i + 1]
                    ELSE (300 * xs[i + 1] + 700 * (lvl + trend))
                         // 1000 END,
               CASE WHEN i = 0 THEN 0
                    ELSE (100 * ((300 * xs[i + 1] + 700
                          * (lvl + trend)) // 1000 - lvl)) // 1000
                         + (900 * trend) // 1000 END
        FROM fold, daily WHERE i < len(xs)
    ),
    final AS MATERIALIZED (
        SELECT sse, lvl, trend, CAST(i AS BIGINT) AS n_days
        FROM fold WHERE i = (SELECT len(xs) FROM daily)
    )
    SELECT CAST(h AS BIGINT) AS h, lvl + h * trend AS forecast_milli,
           lvl AS level_milli, trend AS trend_milli,
           sse AS sse_milli2, n_days
    FROM final CROSS JOIN (SELECT unnest([1, 2, 3]) AS h)
""")
def ts_holt_replay(spark, sf_dir):
    """Holt linear-trend replay (alpha=300, beta=100 milli) over the
    daily order counts: level/trend state folded through the series,
    one-step errors against the pre-update level+trend, and h=1..3
    step-ahead forecasts level + h*trend. Spark folds with the pure
    `aggregate` lambda (the trend term re-inlines the new-level
    expression); the oracle uses WITH RECURSIVE because DuckDB's
    list_reduce corrupts coupled-field struct state (module
    docstring). Both engines split the beta and (1-beta) integer
    divisions identically."""
    newlvl = "(300 * x + 700 * (acc.lvl + acc.trend)) div 1000"
    fold = ("aggregate(xs,"
            " named_struct('sse', CAST(0 AS BIGINT),"
            " 'lvl', CAST(0 AS BIGINT),"
            " 'trend', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT)),"
            " (acc, x) -> named_struct("
            " 'sse', acc.sse + CASE WHEN acc.n = 0 THEN 0"
            " ELSE (x - acc.lvl - acc.trend)"
            " * (x - acc.lvl - acc.trend) END,"
            f" 'lvl', CASE WHEN acc.n = 0 THEN x ELSE {newlvl} END,"
            " 'trend', CASE WHEN acc.n = 0 THEN 0"
            f" ELSE (100 * ({newlvl} - acc.lvl)) div 1000"
            " + (900 * acc.trend) div 1000 END,"
            " 'n', acc.n + 1))")
    folded = (_daily_xs(spark, sf_dir)
              .select(F.expr("size(xs)").cast("bigint").alias("n_days"),
                      F.expr(fold).alias("st")))
    hs = spark.range(1, 4).select(F.col("id").cast("bigint").alias("h"))
    return (hs.crossJoin(F.broadcast(folded))
            .select("h",
                    (F.col("st.lvl") + F.col("h") * F.col("st.trend"))
                    .alias("forecast_milli"),
                    F.col("st.lvl").alias("level_milli"),
                    F.col("st.trend").alias("trend_milli"),
                    F.col("st.sse").alias("sse_milli2"),
                    "n_days"))


@query("ts_ses_by_key", oracle="""
    WITH daily AS MATERIALIZED (
        SELECT c_nationkey AS nat,
               list(x * 1000 ORDER BY day) AS xs
        FROM (
            SELECT c_nationkey, CAST(o_orderdate AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ) GROUP BY 1
    )
    SELECT nat AS c_nationkey, CAST(len(xs) AS BIGINT) AS n_days,
           st.lvl AS final_level_milli, st.sse AS sse_milli2
    FROM (
        SELECT nat, xs,
               list_reduce(
                   list_prepend(
                       struct_pack(sse := CAST(0 AS BIGINT),
                                   lvl := CAST(0 AS BIGINT),
                                   n := CAST(0 AS BIGINT)),
                       list_transform(xs, x -> struct_pack(
                           sse := CAST(0 AS BIGINT),
                           lvl := CAST(x AS BIGINT),
                           n := CAST(0 AS BIGINT)))),
                   (acc, e) -> struct_pack(
                       sse := acc.sse + CASE WHEN acc.n = 0 THEN 0
                              ELSE (e.lvl - acc.lvl)
                                   * (e.lvl - acc.lvl) END,
                       lvl := CASE WHEN acc.n = 0 THEN e.lvl
                              ELSE acc.lvl + (300 * (e.lvl - acc.lvl))
                                   // 1000 END,
                       n := acc.n + 1)) AS st
        FROM daily
    )
""")
def ts_ses_by_key(spark, sf_dir):
    """Segmented SES (alpha=300 milli): each customer nation's daily
    order-count series folded independently — the per-key smoothing
    shape that parallelizes by key at any corpus size (one shuffle to
    the per-nation day census, then 25 embarrassingly parallel
    folds; with millions of keys the same plan is a segmented scan,
    no driver state)."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    daily = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
             .groupBy(F.col("c_nationkey").alias("nat"),
                      F.col("o_orderdate").cast("date").alias("day"))
             .agg(F.count("*").alias("x"))
             .groupBy("nat")
             .agg(F.expr("transform(sort_array(collect_list("
                         "struct(day, x))), s -> s.x * 1000)")
                  .alias("xs")))
    fold = ("aggregate(xs,"
            " named_struct('sse', CAST(0 AS BIGINT),"
            " 'lvl', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT)),"
            " (acc, x) -> named_struct("
            " 'sse', acc.sse + CASE WHEN acc.n = 0 THEN 0"
            " ELSE (x - acc.lvl) * (x - acc.lvl) END,"
            " 'lvl', CASE WHEN acc.n = 0 THEN x"
            " ELSE acc.lvl + (300 * (x - acc.lvl)) div 1000 END,"
            " 'n', acc.n + 1))")
    return (daily.select(
        F.col("nat").alias("c_nationkey"),
        F.expr("size(xs)").cast("bigint").alias("n_days"),
        F.expr(fold + ".lvl").alias("final_level_milli"),
        F.expr(fold + ".sse").alias("sse_milli2")))
