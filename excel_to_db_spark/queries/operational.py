"""Operational data-engineering pack (Tier B/C extensions).

MERGE-style CDC application, rolling-window distinct users, and
last-touch attribution — the operational jobs that surround a warehouse
(the reference's passthrough surface, src/main.rs:220, reaches the same
semantics through SQLite SQL; here each is a declarative Spark plan
with scale-invariant shuffle structure).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import query
from .relational import T


# ---------------------------------------------------------- CDC merge

@query("cdc_merge_upsert", oracle="""
    WITH changes AS (
        SELECT c_custkey AS key,
               CASE WHEN c_custkey % 17 = 0 THEN 'D'
                    ELSE 'U' END AS op,
               round(c_acctbal + 100.0, 2) AS new_acctbal,
               'UPGRADED' AS new_segment
        FROM customer WHERE c_custkey % 10 = 0 OR c_custkey % 17 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'I', round(c_acctbal, 2), 'FRESH'
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT coalesce(ch.key, c_custkey) AS c_custkey,
           CASE WHEN ch.op IN ('U', 'I') THEN ch.new_acctbal
                ELSE round(c_acctbal, 2) END AS c_acctbal,
           CASE WHEN ch.op IN ('U', 'I') THEN ch.new_segment
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    FULL JOIN changes ch ON c_custkey = ch.key
    WHERE ch.op IS NULL OR ch.op <> 'D'
""")
def cdc_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics on plain parquet: apply a CDC batch of
    updates, inserts, and deletes to a snapshot in one declarative
    pass — full-outer join on the key, change side wins, deletes drop.

    This is the lakehouse upsert expressed without a table format:
    matched-update / not-matched-insert / matched-delete all resolve in
    a single join whose key is the natural co-partitioning (at scale,
    both sides hash-shuffle once on the key; a small CDC batch
    broadcasts instead). The change batch is derived deterministically
    from the snapshot itself so the oracle replays it bit-for-bit."""
    c = T(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    upserts = (c.filter((k % 10 == 0) | (k % 17 == 0))
               .select(k.alias("key"),
                       F.when(k % 17 == 0, "D").otherwise("U").alias("op"),
                       F.round(F.col("c_acctbal") + 100.0, 2)
                        .alias("new_acctbal"),
                       F.lit("UPGRADED").alias("new_segment")))
    inserts = (c.filter(k % 97 == 0)
               .select((k + 1000000).alias("key"), F.lit("I").alias("op"),
                       F.round("c_acctbal", 2).alias("new_acctbal"),
                       F.lit("FRESH").alias("new_segment")))
    changes = upserts.unionAll(inserts)
    base = c.select("c_custkey", "c_acctbal", "c_mktsegment")
    merged = base.join(changes, base.c_custkey == changes.key, "full_outer")
    applied = F.col("op").isin("U", "I")
    return (merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
            .select(F.coalesce("key", "c_custkey").alias("c_custkey"),
                    F.when(applied, F.col("new_acctbal"))
                     .otherwise(F.round("c_acctbal", 2)).alias("c_acctbal"),
                    F.when(applied, F.col("new_segment"))
                     .otherwise(F.col("c_mktsegment")).alias("c_mktsegment")))


# --------------------------------------------------------- rolling WAU

@query("rolling_wau", oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    contrib AS (
        SELECT CAST(unnest(generate_series(day, day + 6,
                                           INTERVAL 1 DAY)) AS DATE) AS day,
               user_id
        FROM du
    ),
    bounds AS (SELECT max(day) AS max_day FROM du)
    SELECT day, count(DISTINCT user_id) AS wau
    FROM contrib, bounds
    WHERE day <= max_day
    GROUP BY day
""")
def rolling_wau(spark, sf_dir):
    """Rolling 7-day active users per day (WAU) — distinct-count over a
    sliding date window.

    The scalable shape: dedup to (day, user) pairs, then EXPLODE each
    pair into the <=7 report days it contributes to and count distinct
    per day — bounded 7x fan-out of the already-deduped pairs, one
    shuffle. The naive alternative (range-join every day against every
    pair) is a nested-loop that dies at scale; a distinct-count window
    frame doesn't exist in either engine. Tail days beyond the last
    observation are clipped."""
    e = T(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    contrib = du.select(
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("day"),
        "user_id")
    bounds = du.agg(F.max("day").alias("max_day"))
    return (contrib.crossJoin(F.broadcast(bounds))
            .filter(F.col("day") <= F.col("max_day"))
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias("wau")))


# -------------------------------------------------- last-touch model

@query("attribution_last_touch", oracle="""
    WITH seq AS (
        SELECT event_id, event_type,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS click_id
        FROM events
    )
    SELECT event_id AS purchase_id, click_id
    FROM seq WHERE event_type = 'purchase'
""")
def attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the same
    user's most recent preceding click (NULL if the user never clicked
    before buying).

    A single IGNORE NULLS carry-forward window does the whole model —
    no purchase x click self-join, one user_id shuffle, and the carried
    state is one value per row regardless of history length. (The
    purchase filter can't be pushed below the window — every event must
    flow through to carry the click — which is exactly the streaming
    carry-forward shape.)"""
    e = T(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    click = F.when(F.col("event_type") == "click", F.col("event_id"))
    seq = e.select(
        "event_id", "event_type",
        F.last(click, ignorenulls=True).over(w).alias("click_id"))
    return (seq.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "click_id"))


# ---------------------------------------------- bot-regularity heuristics

@query("events_bot_heuristics", oracle="""
    WITH g AS (
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT)
               - lag(CAST(epoch_us(ts) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(gap) AS BIGINT) AS s,
               sum(CAST(gap AS HUGEINT) * gap) AS ss
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
    ),
    sc AS (
        SELECT user_id, n,
               CASE WHEN s = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST((1000000 * (n * ss - CAST(s AS HUGEINT) * s))
                              // (CAST(s AS HUGEINT) * s) AS BIGINT)
               END AS cv2_micro
        FROM u WHERE n >= 20
    )
    SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN cv2_micro < 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bot_like,
           CAST(min(cv2_micro) AS BIGINT) AS min_cv2_micro
    FROM sc
""")
def events_bot_heuristics(spark, sf_dir):
    """Bot-likeness census from inter-event timing regularity: a human
    user's gaps between consecutive events are bursty (squared
    coefficient of variation cv^2 = var/mean^2 near or above 1); a
    scripted client fires on a timer (cv^2 near 0). Scores every user
    with >= 20 gaps and flags cv^2 < 0.01 — the first-line abuse signal
    a telemetry pipeline computes before any model-based detection.

    Exactness: gaps are exact epoch-microsecond BIGINT differences;
    cv^2 = (n*ss - s^2)/s^2 is formed from exact integer moments in
    DECIMAL(38,0)/HUGEINT (s^2 alone overflows int64 for active users)
    and reported in integer micro-units via floor division — no float
    exists anywhere in the statistic. A user whose >= 20 gaps are ALL
    zero (batch uploads sharing one timestamp) is the limit case of
    regularity: cv^2 is defined as 0 there, flagging it, rather than
    dividing by s = 0 or silently dropping the strongest bot signal.

    Scale shape: one user-partitioned lag window (the shuffle any
    sessionization already pays), a per-user moment aggregate, then a
    scalar census. Moments bound: the scored numerator is
    1e6 * n * ss ~ 1e6 * n^2 * gap^2, inside DECIMAL(38,0) up to
    ~3e5 gaps/user at day-scale gaps (and ~1e8 at minute-scale) —
    beyond that, rescale gaps to milliseconds before the moments (the
    statistic is scale-invariant)."""
    e = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select("user_id",
                 (F.unix_micros(F.col("ts"))
                  - F.lag(F.unix_micros(F.col("ts"))).over(w)).alias("gap"))
    d38 = "decimal(38,0)"
    u = (g.filter(F.col("gap").isNotNull())
         .groupBy("user_id")
         .agg(F.count("*").alias("n"),
              F.sum("gap").alias("s"),
              F.sum(F.col("gap").cast(d38) * F.col("gap")).alias("ss")))
    sc = (u.filter(F.col("n") >= 20)
          .select("user_id", "n", F.expr(
              "CASE WHEN s = 0 THEN CAST(0 AS BIGINT) "
              "ELSE CAST((1000000 * (n * ss - CAST(s AS DECIMAL(38,0)) * s)) "
              "DIV (CAST(s AS DECIMAL(38,0)) * s) AS BIGINT) END")
              .alias("cv2_micro")))
    n_users = u.agg(F.count("*").alias("n_users"))
    return (sc.agg(F.count("*").alias("n_scored"),
                   F.sum(F.when(F.col("cv2_micro") < 10000, 1).otherwise(0))
                   .cast("bigint").alias("n_bot_like"),
                   F.min("cv2_micro").alias("min_cv2_micro"))
            .crossJoin(F.broadcast(n_users))
            .select("n_users", "n_scored", "n_bot_like", "min_cv2_micro"))
