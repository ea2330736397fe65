"""Sensitivity-sweep pack (round 5, batch 60): attribution-window
sensitivity, a majority-vote stump ensemble, the epidemiological 2x2
panel, and a shingle-size dedup sweep. The reference engine (294 LoC
of Rust delegating to SQLite, reference src/main.rs) has none of this
surface; these are Tier-C mission operators — each key runs ONE
analysis at several design points at once, because the design choice
(window length, shingle size, single model vs ensemble) is itself the
decision under audit:

- Attribution-window sweep: click-attributed purchase share at
  1h/6h/24h lookbacks — if the number swings with the window, the
  window IS the number (the classic MTA governance fight, settled
  with data).
- Majority-vote ensemble: three one-feature stumps (value, hour,
  weekday) vs their vote — Condorcet's jury theorem in the engine
  (the vote beats each member when members are weak and diverse).
- The 2x2 panel: odds ratio, risk ratio, risk difference with Woolf
  and Wald CIs — the complete epidemiological table readout
  (stats_cmh_test pools many 2x2s; this is the single-table
  standard).
- Shingle-size sweep: cross-half n-gram Jaccard at n = 2/3/4 — the
  dedup design curve (bigger shingles = fewer false candidate pairs
  = lower measured overlap; pick the knee).

Determinism contract (SURVEY §4.3): lookback gaps, vote counts, 2x2
cells, and shingle memberships are exact integers; all ratios/CIs
are fixed expressions over exact counts; ln-based CIs snap their
inputs first."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .relational import T


# ------------------------------------- attribution window sweep

@query("events_attribution_window_sweep", oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS s,
               max(CASE WHEN event_type = 'click'
                   THEN CAST(floor(epoch(ts)) AS BIGINT) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS last_click_s
        FROM events
    ),
    purch AS (
        SELECT s - last_click_s AS gap
        FROM seq WHERE event_type = 'purchase'
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(CASE WHEN gap <= 3600 THEN 1 ELSE 0 END)
                    AS BIGINT) AS w1h,
               CAST(sum(CASE WHEN gap <= 21600 THEN 1 ELSE 0 END)
                    AS BIGINT) AS w6h,
               CAST(sum(CASE WHEN gap <= 86400 THEN 1 ELSE 0 END)
                    AS BIGINT) AS w24h
        FROM purch
    )
    SELECT n_purchases,
           round(CAST(w1h AS DOUBLE) / n_purchases, 6) AS share_1h,
           round(CAST(w6h AS DOUBLE) / n_purchases, 6) AS share_6h,
           round(CAST(w24h AS DOUBLE) / n_purchases, 6) AS share_24h
    FROM st
""")
def events_attribution_window_sweep(spark, sf_dir):
    """Attribution-window sensitivity: the share of purchases with a
    SAME-USER click in the preceding 1h / 6h / 24h — the lookback
    sweep that settles the classic measurement fight ("is the click
    driving the purchase, or is 24h just long enough to catch
    coincidence?"). A share that doubles from 1h to 24h means the
    attribution number is a window artifact; a flat curve means the
    clicks really precede the purchases. Complements the repo's
    last-touch/position/Markov/Shapley keys by auditing the WINDOW
    those models all quietly assume.

    The last-click timestamp is a per-user running max over the
    pinned (ts, event_id) order (strictly-preceding frame — a
    purchase cannot attribute to itself or a later click); gaps and
    all three conditional counts are exact integers off ONE pass;
    purchases with no prior click have NULL gap and count in no
    window (the honest denominator is all purchases).

    Scale shape: one per-user ordered window + ONE conditional
    aggregate."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    seq = T(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").alias("s"),
        F.col("ts"), F.col("event_id"))
    seq = seq.select(
        "event_type", "s",
        F.max(F.when(F.col("event_type") == "click", F.col("s")))
        .over(w).alias("last_click_s"))
    purch = (seq.filter(F.col("event_type") == "purchase")
             .select((F.col("s") - F.col("last_click_s"))
                     .alias("gap")))
    st = purch.agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.when(F.col("gap") <= 3600, 1).otherwise(0))
        .alias("w1h"),
        F.sum(F.when(F.col("gap") <= 21600, 1).otherwise(0))
        .alias("w6h"),
        F.sum(F.when(F.col("gap") <= 86400, 1).otherwise(0))
        .alias("w24h"))
    return st.select(
        "n_purchases",
        F.round(F.col("w1h").cast("double") / F.col("n_purchases"), 6)
        .alias("share_1h"),
        F.round(F.col("w6h").cast("double") / F.col("n_purchases"), 6)
        .alias("share_6h"),
        F.round(F.col("w24h").cast("double") / F.col("n_purchases"), 6)
        .alias("share_24h"))


# --------------------------------------------- majority-vote ensemble

_VOTE_SPLIT = """
        SELECT thr FROM (
            SELECT f AS thr,
                   CAST(pl AS DOUBLE) * pl / cl
                   + CAST(pt - pl AS DOUBLE) * (pt - pl) / (ct - cl)
                       AS score
            FROM (
                SELECT f,
                       CAST(sum(cnt) OVER (ORDER BY f
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cl,
                       CAST(sum(pos) OVER (ORDER BY f
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
                       CAST(sum(cnt) OVER () AS BIGINT) AS ct,
                       CAST(sum(pos) OVER () AS BIGINT) AS pt
                FROM (SELECT {feat} AS f,
                             CAST(count(*) AS BIGINT) AS cnt,
                             CAST(sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) AS BIGINT)
                                 AS pos
                      FROM base GROUP BY 1)
            ) WHERE cl < ct
            ORDER BY score DESC, thr ASC LIMIT 1
        )
"""


@query("ml_majority_vote_ensemble", oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) // 1000 AS f_val,
               CAST(hour(ts) AS BIGINT) AS f_hr,
               CAST(((date_diff('day', DATE '1995-01-02',
                                CAST(ts AS DATE)) % 7) + 7) % 7
                    AS BIGINT) AS f_dow,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS y
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    t1 AS ({_VOTE_SPLIT.format(feat="f_val")}),
    t2 AS ({_VOTE_SPLIT.format(feat="f_hr")}),
    t3 AS ({_VOTE_SPLIT.format(feat="f_dow")}),
    -- each stump votes for the side with the higher purchase rate;
    -- on this corpus that is ABOVE the value cut and we orient all
    -- three stumps identically (predict 1 above the threshold)
    scored AS (
        SELECT y,
               CASE WHEN f_val > t1.thr THEN 1 ELSE 0 END AS v1,
               CASE WHEN f_hr > t2.thr THEN 1 ELSE 0 END AS v2,
               CASE WHEN f_dow > t3.thr THEN 1 ELSE 0 END AS v3
        FROM base, t1, t2, t3
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN v1 = y THEN 1 ELSE 0 END) AS BIGINT)
                   AS a1,
               CAST(sum(CASE WHEN v2 = y THEN 1 ELSE 0 END) AS BIGINT)
                   AS a2,
               CAST(sum(CASE WHEN v3 = y THEN 1 ELSE 0 END) AS BIGINT)
                   AS a3,
               CAST(sum(CASE WHEN (CASE WHEN v1 + v2 + v3 >= 2 THEN 1
                                   ELSE 0 END) = y THEN 1 ELSE 0 END)
                    AS BIGINT) AS av
        FROM scored
    )
    SELECT n,
           round(CAST(a1 AS DOUBLE) / n, 6) AS acc_value,
           round(CAST(a2 AS DOUBLE) / n, 6) AS acc_hour,
           round(CAST(a3 AS DOUBLE) / n, 6) AS acc_dow,
           round(CAST(av AS DOUBLE) / n, 6) AS acc_vote
    FROM st
""")
def ml_majority_vote_ensemble(spark, sf_dir):
    """Majority-vote ensemble of three one-feature stumps (value
    bucket, hour, weekday) on purchase-vs-view: each stump picks its
    Gini-optimal threshold, all three vote, and the panel reports
    each member's accuracy beside the vote's — Condorcet's jury
    theorem run in the engine (the vote beats its members exactly
    when they are better than chance AND disagree; correlated or
    chance-level members drag it down, and the side-by-side panel
    shows which regime this corpus is in). The ensemble step every
    bagging/boosting pipeline takes, isolated and auditable.

    Stump thresholds reuse the ml_tree_depth2 machinery per feature
    (exact cumulative counts, snapped-free integer ordering with
    smallest-threshold ties, all stumps oriented predict-1-above);
    votes and accuracies are exact conditional counts off ONE
    rescoring pass.

    Scale shape: three bounded histogram argmaxes + one
    conditional-aggregate rescore."""
    base = (T(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("purchase", "view"))
            .select(F.expr("CAST(round(value * 100) AS BIGINT)"
                           " DIV 1000").alias("f_val"),
                    F.hour("ts").cast("bigint").alias("f_hr"),
                    F.pmod(F.datediff(F.col("ts").cast("date"),
                                      F.lit("1995-01-02").cast("date")),
                           7).cast("bigint").alias("f_dow"),
                    F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0).alias("y")))

    def stump(feat):
        hist = base.groupBy(F.col(feat).alias("f")).agg(
            F.count("*").alias("cnt"), F.sum("y").alias("pos"))
        wc = Window.orderBy("f").rowsBetween(
            Window.unboundedPreceding, 0)
        wt = Window.partitionBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)
        cum = hist.select(
            "f", F.sum("cnt").over(wc).alias("cl"),
            F.sum("pos").over(wc).alias("pl"),
            F.sum("cnt").over(wt).alias("ct"),
            F.sum("pos").over(wt).alias("pt"))
        score = (F.col("pl").cast("double") * F.col("pl") / F.col("cl")
                 + (F.col("pt") - F.col("pl")).cast("double")
                 * (F.col("pt") - F.col("pl"))
                 / (F.col("ct") - F.col("cl")))
        return (cum.filter(F.col("cl") < F.col("ct"))
                .select(F.col("f").alias("thr"), score.alias("sc"))
                .orderBy(F.col("sc").desc(), F.col("thr").asc())
                .limit(1).select("thr"))

    t1 = stump("f_val").select(F.col("thr").alias("thr1"))
    t2 = stump("f_hr").select(F.col("thr").alias("thr2"))
    t3 = stump("f_dow").select(F.col("thr").alias("thr3"))
    scored = (base.crossJoin(F.broadcast(t1))
              .crossJoin(F.broadcast(t2))
              .crossJoin(F.broadcast(t3))
              .select("y",
                      F.when(F.col("f_val") > F.col("thr1"), 1)
                      .otherwise(0).alias("v1"),
                      F.when(F.col("f_hr") > F.col("thr2"), 1)
                      .otherwise(0).alias("v2"),
                      F.when(F.col("f_dow") > F.col("thr3"), 1)
                      .otherwise(0).alias("v3")))
    vote = F.when(F.col("v1") + F.col("v2") + F.col("v3") >= 2, 1) \
        .otherwise(0)
    st = scored.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("v1") == F.col("y"), 1).otherwise(0))
        .alias("a1"),
        F.sum(F.when(F.col("v2") == F.col("y"), 1).otherwise(0))
        .alias("a2"),
        F.sum(F.when(F.col("v3") == F.col("y"), 1).otherwise(0))
        .alias("a3"),
        F.sum(F.when(vote == F.col("y"), 1).otherwise(0)).alias("av"))
    return st.select(
        "n",
        F.round(F.col("a1").cast("double") / F.col("n"), 6)
        .alias("acc_value"),
        F.round(F.col("a2").cast("double") / F.col("n"), 6)
        .alias("acc_hour"),
        F.round(F.col("a3").cast("double") / F.col("n"), 6)
        .alias("acc_dow"),
        F.round(F.col("av").cast("double") / F.col("n"), 6)
        .alias("acc_vote"))


# -------------------------------------------------- 2x2 panel

@query("stats_two_by_two_panel", oracle="""
    WITH conv AS (
        SELECT ((user_id % 2) + 2) % 2 AS seg,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    cells AS (
        SELECT CAST(sum(CASE WHEN seg = 0 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN seg = 0 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN seg = 1 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN seg = 1 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS d
        FROM conv
    ),
    est AS (
        SELECT a, b, c, d,
               round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c),
                     6) AS odds_ratio,
               round((CAST(a AS DOUBLE) / (a + b))
                     / (CAST(c AS DOUBLE) / (c + d)), 6) AS risk_ratio,
               round(CAST(a AS DOUBLE) / (a + b)
                     - CAST(c AS DOUBLE) / (c + d), 6) AS risk_diff
        FROM cells
    )
    SELECT a, b, c, d, odds_ratio, risk_ratio, risk_diff,
           round(exp(ln(odds_ratio)
                     - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c
                                   + 1.0 / d)), 6) AS or_ci_lo,
           round(exp(ln(odds_ratio)
                     + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c
                                   + 1.0 / d)), 6) AS or_ci_hi
    FROM est
""")
def stats_two_by_two_panel(spark, sf_dir):
    """The complete 2x2 table panel for user-day purchase conversion
    by segment: odds ratio with the Woolf log-CI, risk ratio, and
    risk difference — the three effect measures every epidemiology
    and A/B readout needs TOGETHER, because they disagree exactly
    when the base rate makes one of them misleading (OR inflates
    away from RR at high base rates; the difference carries the
    absolute business impact). stats_cmh_test pools many 2x2s and
    stats_two_prop_z tests the difference; this key is the
    single-table standard readout.

    Cells are exact conditional counts off the user-day conversion
    collapse (the stats_two_prop_z grain); the three estimates and
    the Woolf CI are fixed expressions; the CI consumes the SNAPPED
    odds ratio (snap, then consume).

    Scale shape: one (user, day) aggregate + ONE 1-row conditional
    reduce."""
    conv = (T(spark, sf_dir, "events")
            .groupBy("user_id",
                     F.date_trunc("day", F.col("ts")).alias("d"))
            .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("conv"))
            .select(F.pmod(F.col("user_id"), 2).alias("seg"), "conv"))
    cells = conv.agg(
        F.sum(F.when((F.col("seg") == 0) & (F.col("conv") == 1), 1)
              .otherwise(0)).alias("a"),
        F.sum(F.when((F.col("seg") == 0) & (F.col("conv") == 0), 1)
              .otherwise(0)).alias("b"),
        F.sum(F.when((F.col("seg") == 1) & (F.col("conv") == 1), 1)
              .otherwise(0)).alias("c"),
        F.sum(F.when((F.col("seg") == 1) & (F.col("conv") == 0), 1)
              .otherwise(0)).alias("d"))
    orr = F.round(F.col("a").cast("double") * F.col("d")
                  / (F.col("b").cast("double") * F.col("c")), 6)
    est = cells.select(
        "a", "b", "c", "d", orr.alias("odds_ratio"),
        F.round((F.col("a").cast("double") / (F.col("a") + F.col("b")))
                / (F.col("c").cast("double")
                   / (F.col("c") + F.col("d"))), 6).alias("risk_ratio"),
        F.round(F.col("a").cast("double") / (F.col("a") + F.col("b"))
                - F.col("c").cast("double")
                / (F.col("c") + F.col("d")), 6).alias("risk_diff"))
    se = F.sqrt(1.0 / F.col("a") + 1.0 / F.col("b")
                + 1.0 / F.col("c") + 1.0 / F.col("d"))
    return est.select(
        "a", "b", "c", "d", "odds_ratio", "risk_ratio", "risk_diff",
        F.round(F.exp(F.log(F.col("odds_ratio")) - 1.96 * se), 6)
        .alias("or_ci_lo"),
        F.round(F.exp(F.log(F.col("odds_ratio")) + 1.96 * se), 6)
        .alias("or_ci_hi"))


# ---------------------------------------------- shingle-size sweep

@query("text_shingle_size_sweep", oracle="""
    WITH d AS (
        SELECT doc_id % 2 AS half, string_split(text, ' ') AS t
        FROM documents WHERE len(string_split(text, ' ')) >= 4
    ),
    grams AS (
        SELECT 2 AS n, half, t[i] || ' ' || t[i + 1] AS g
        FROM d, unnest(range(1, len(t))) AS u(i)
        UNION ALL
        SELECT 3, half, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        FROM d, unnest(range(1, len(t) - 1)) AS u(i)
        UNION ALL
        SELECT 4, half,
               t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' '
               || t[i + 3]
        FROM d, unnest(range(1, len(t) - 2)) AS u(i)
    ),
    sets AS (
        SELECT n, g,
               CAST(max(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS in_a,
               CAST(max(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS in_b
        FROM grams GROUP BY n, g
    )
    SELECT CAST(n AS BIGINT) AS shingle_n,
           CAST(count(*) AS BIGINT) AS n_union,
           round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 6)
               AS jaccard
    FROM sets GROUP BY n ORDER BY shingle_n
""")
def text_shingle_size_sweep(spark, sf_dir):
    """Shingle-size design sweep for near-dup detection: the
    cross-half n-gram Jaccard at n = 2, 3, 4 — the curve every
    MinHash deployment should look at before fixing its shingle size
    (small shingles saturate toward 1 on any shared vocabulary,
    producing false candidate floods; large shingles miss paraphrase;
    the knee is the operating point). On this corpus the bigram
    Jaccard is near 1 (closed vocabulary) while 4-grams
    discriminate — exactly the saturation the sweep exists to
    expose. The design-audit companion to dedup_jaccard /
    sketch_kmv_jaccard, which RUN at a fixed n.

    All three shingle layers come from one document scan (a 3-branch
    in-array construction); memberships and intersections are exact
    integers; one ratio per n. Jaccard must fall monotonically with
    n (supersets of context) — tested.

    Scale shape: one explode per n (single scan, union'd) + one
    (n, gram) aggregate + a 3-row reduce."""
    d = (T(spark, sf_dir, "documents")
         .select(F.pmod(F.col("doc_id"), 2).alias("half"),
                 F.split(F.col("text"), " ").alias("t"))
         .filter(F.size("t") >= 4))
    layers = []
    for n in (2, 3, 4):
        parts = ", ' ', ".join([f"t[i + {j}]" for j in range(n)])
        layers.append(d.select(
            F.lit(n).alias("n"), "half",
            F.explode(F.expr(
                f"transform(sequence(0, size(t) - {n}),"
                f" i -> concat({parts}))")).alias("g")))
    grams = layers[0].unionAll(layers[1]).unionAll(layers[2])
    sets = grams.groupBy("n", "g").agg(
        F.max(F.when(F.col("half") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("half") == 1, 1).otherwise(0)).alias("in_b"))
    return (sets.groupBy("n")
            .agg(F.count("*").alias("n_union"),
                 F.round(F.sum(F.col("in_a") * F.col("in_b"))
                         .cast("double") / F.count("*"), 6)
                 .alias("jaccard"))
            .select(F.col("n").cast("bigint").alias("shingle_n"),
                    "n_union", "jaccard")
            .orderBy("shingle_n"))
