"""Event-replay simulation pack (round 6, batch 87). The reference
engine (294 LoC of Rust delegating to SQLite, reference src/main.rs)
has none of this; two Tier-C mission operators that run DISCRETE-EVENT
SIMULATIONS in-engine as ordered integer folds (the chain-ladder
`list_reduce`/`aggregate` machinery applied to stateful replay — the
shape that lets a warehouse answer "what would policy X have done"
without exporting the log):

- ops_token_bucket_replay: a token-bucket rate limiter (capacity 10,
  refill 1 token / 600 s, milli-token state) replayed over each
  user's event stream; per-user rejection counts histogrammed. The
  fold is per-user over a bounded sorted list — the segmented-scan
  shape that parallelizes by key at any corpus size.
- ops_lindley_replay: single-server queue waiting times by Lindley's
  recursion W' = max(0, W + S - dt) (pinned 60 s service) replayed
  over each day's click arrivals; per-day arrival count, max wait,
  and milli mean wait. The workload-model twin of the analytic
  `ops_erlang_c`/`ops_erlang_b_blocking` keys — replay measures what
  the formulas assume.

Both folds carry BIGINT struct state with CASE-guarded first-step
sentinels. ENGINE TRAP (pinned rule): DuckDB's list_reduce evaluates
struct_pack fields SEQUENTIALLY — a later field that reads acc.<x>
sees the value just assigned in THIS step, while Spark's aggregate
lambda is pure. Every fold here therefore orders its fields so no
field reads an accumulator field assigned earlier in the same struct
(reads-before-writes order), which makes both engines compute the
identical pure fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from .relational import T

_CAP = 10_000        # bucket capacity, milli-tokens
_REFILL_NUM = 1000   # 1 token per 600 s -> (dt * 1000) // 600 milli
_REFILL_DEN = 600


@query("ops_token_bucket_replay", oracle=f"""
    WITH ev AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               event_id
        FROM events
    ),
    seqs AS MATERIALIZED (
        SELECT user_id, list(sec ORDER BY sec, event_id) AS secs
        FROM ev GROUP BY user_id
    ),
    folded AS (
        SELECT user_id, len(secs) AS n_events,
               list_reduce(
                   list_prepend(
                       struct_pack(r := CAST(0 AS BIGINT),
                                   t := CAST({_CAP} AS BIGINT),
                                   l := CAST(0 AS BIGINT)),
                       list_transform(secs, x -> struct_pack(
                           r := CAST(0 AS BIGINT),
                           t := CAST(x AS BIGINT),
                           l := CAST(0 AS BIGINT)))),
                   (acc, e) -> struct_pack(
                       r := acc.r + (CASE WHEN least({_CAP}, acc.t
                                     + (e.t - acc.l) * {_REFILL_NUM}
                                       // {_REFILL_DEN}) >= 1000
                                    THEN 0 ELSE 1 END),
                       t := least({_CAP}, acc.t + (e.t - acc.l)
                                  * {_REFILL_NUM} // {_REFILL_DEN})
                            - (CASE WHEN least({_CAP}, acc.t
                                     + (e.t - acc.l) * {_REFILL_NUM}
                                       // {_REFILL_DEN}) >= 1000
                                    THEN 1000 ELSE 0 END),
                       l := e.t)) AS st
        FROM seqs
    )
    SELECT least(st.r, 10) AS rejected_bucket,
           count(*) AS n_users,
           CAST(sum(st.r) AS BIGINT) AS total_rejected,
           CAST(sum(n_events) AS BIGINT) AS total_events
    FROM folded GROUP BY 1
""")
def ops_token_bucket_replay(spark, sf_dir):
    """Token-bucket rate-limiter replay: each user's event stream
    folded through the bucket state (milli-tokens, capacity 10,
    refill 1/600s — every step integer) to count the requests the
    policy WOULD have rejected; per-user rejection counts
    histogrammed (10+ capped). Per-user ordered fold over a bounded
    list — segmented scan, parallel by user at any scale."""
    ev = T(spark, sf_dir, "events")
    seqs = (ev.select("user_id", F.expr("unix_timestamp(ts)").alias("sec"),
                      "event_id")
            .groupBy("user_id")
            .agg(F.expr("transform(sort_array(collect_list("
                        "struct(sec, event_id))), s -> s.sec)")
                 .alias("secs")))
    fold = (f"aggregate(secs,"
            f" named_struct('r', CAST(0 AS BIGINT),"
            f" 't', CAST({_CAP} AS BIGINT), 'l', CAST(0 AS BIGINT)),"
            f" (acc, e) -> named_struct("
            f" 'r', acc.r + (CASE WHEN least({_CAP}, acc.t + (e - acc.l)"
            f" * {_REFILL_NUM} div {_REFILL_DEN}) >= 1000"
            f" THEN 0 ELSE 1 END),"
            f" 't', least({_CAP}, acc.t + (e - acc.l)"
            f" * {_REFILL_NUM} div {_REFILL_DEN})"
            f" - (CASE WHEN least({_CAP}, acc.t + (e - acc.l)"
            f" * {_REFILL_NUM} div {_REFILL_DEN}) >= 1000"
            f" THEN 1000 ELSE 0 END),"
            f" 'l', e))")
    folded = seqs.select("user_id", F.expr("size(secs)").alias("n_events"),
                         F.expr(fold).alias("st"))
    return (folded.groupBy(F.expr("least(st.r, 10)").cast("bigint")
                           .alias("rejected_bucket"))
            .agg(F.count("*").alias("n_users"),
                 F.expr("sum(st.r)").cast("bigint")
                 .alias("total_rejected"),
                 F.sum("n_events").cast("bigint").alias("total_events")))


@query("ops_lindley_replay", oracle="""
    WITH clk AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
        FROM events WHERE event_type = 'click'
    ),
    seqs AS MATERIALIZED (
        SELECT day, list(sec ORDER BY sec, event_id) AS secs
        FROM clk GROUP BY day
    ),
    folded AS (
        SELECT day, len(secs) AS n_arrivals,
               list_reduce(
                   list_prepend(
                       struct_pack(mx := CAST(0 AS BIGINT),
                                   tot := CAST(0 AS BIGINT),
                                   w := CAST(0 AS BIGINT),
                                   l := CAST(-1 AS BIGINT)),
                       list_transform(secs, x -> struct_pack(
                           mx := CAST(0 AS BIGINT),
                           tot := CAST(0 AS BIGINT),
                           w := CAST(x AS BIGINT),
                           l := CAST(0 AS BIGINT)))),
                   (acc, e) -> struct_pack(
                       mx := greatest(acc.mx,
                            CASE WHEN acc.l < 0 THEN CAST(0 AS BIGINT)
                            ELSE greatest(0, acc.w + 60 - (e.w - acc.l))
                            END),
                       tot := acc.tot +
                            CASE WHEN acc.l < 0 THEN CAST(0 AS BIGINT)
                            ELSE greatest(0, acc.w + 60 - (e.w - acc.l))
                            END,
                       w := CASE WHEN acc.l < 0 THEN CAST(0 AS BIGINT)
                            ELSE greatest(0, acc.w + 60 - (e.w - acc.l))
                            END,
                       l := e.w)) AS st
        FROM seqs
    )
    SELECT day, CAST(n_arrivals AS BIGINT) AS n_arrivals,
           CAST(st.mx AS BIGINT) AS max_wait_sec,
           CAST(st.tot * 1000 // n_arrivals AS BIGINT)
               AS avg_wait_milli
    FROM folded
""")
def ops_lindley_replay(spark, sf_dir):
    """Lindley-recursion queue replay: each day's click arrivals fed
    through W' = max(0, W + 60 - interarrival) — the exact waiting
    time a single 60-second server would have produced; per-day max
    and milli mean wait. The measured twin of the Erlang formulas
    (`ops_erlang_c`, `ops_erlang_b_blocking`): replay shows what the
    analytic model's assumptions are worth on the real arrival
    process. Per-day ordered fold over a bounded list."""
    ev = T(spark, sf_dir, "events")
    seqs = (ev.where(F.col("event_type") == "click")
            .select(F.expr("unix_timestamp(ts) div 86400").alias("day"),
                    F.expr("unix_timestamp(ts)").alias("sec"),
                    "event_id")
            .groupBy("day")
            .agg(F.expr("transform(sort_array(collect_list("
                        "struct(sec, event_id))), s -> s.sec)")
                 .alias("secs")))
    step = ("CASE WHEN acc.l < 0 THEN CAST(0 AS BIGINT)"
            " ELSE greatest(0, acc.w + 60 - (e - acc.l)) END")
    fold = (f"aggregate(secs,"
            f" named_struct('mx', CAST(0 AS BIGINT),"
            f" 'tot', CAST(0 AS BIGINT), 'w', CAST(0 AS BIGINT),"
            f" 'l', CAST(-1 AS BIGINT)),"
            f" (acc, e) -> named_struct("
            f" 'mx', greatest(acc.mx, {step}),"
            f" 'tot', acc.tot + {step},"
            f" 'w', {step},"
            f" 'l', e))")
    folded = seqs.select("day", F.expr("size(secs)").alias("n_arrivals"),
                         F.expr(fold).alias("st"))
    return folded.select(
        "day", F.col("n_arrivals").cast("bigint").alias("n_arrivals"),
        F.expr("st.mx").cast("bigint").alias("max_wait_sec"),
        F.expr("st.tot * 1000 div n_arrivals").cast("bigint")
        .alias("avg_wait_milli"))
