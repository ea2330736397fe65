"""Ordinal association / effect-size pack (round 6, batch 62).
The reference engine (294 LoC of Rust delegating to SQLite, reference
src/main.rs) has none of this surface; these are Tier-C mission
operators:

- Cliff's delta + Vargha-Delaney A (Cliff 1993; Vargha & Delaney
  2000): the nonparametric two-sample effect size — P(X>Y) - P(X<Y)
  — that says HOW MUCH two distributions differ after a
  Mann-Whitney says THAT they differ (the repo's `stats_mannwhitney`
  sibling reports the test; this reports the magnitude).
- Goodman-Kruskal gamma (1954): concordance association for
  ordinal×ordinal tables, ties dropped — the canonical "does
  priority rise with ticket size" statistic.
- Somers' D (1962): gamma's asymmetric refinement — penalizes pairs
  tied on the DEPENDENT ordinal only, making it the right statistic
  when one axis is the outcome (also the AUC link: D = 2·AUC - 1).
- Theil's uncertainty coefficient U (1970): the entropy-based
  asymmetric association — what fraction of the outcome's entropy
  the predictor removes; unlike gamma/D it needs no ordering at all.

Determinism contract (SURVEY §4.3): event values go through the
integer-cents snap; all pair counts are exact integers from
value-frequency / cell-count collapse (never row-level pair
enumeration); entropies are exact count ratios through `ln`; outputs
round at 6 decimals.

Scale shapes: Cliff's delta collapses both samples to a VALUE GRID
(distinct cents — range-bounded, ≤ ~20k rows regardless of corpus
size) and takes one ordered window over that grid, so the
single-partition window is bounded by the value range, not the data;
the three table statistics collapse to a 5×4 cell table (one
map-side-combinable groupBy) and do all pair algebra on ≤20 rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .relational import T


def _cells(spark, sf_dir):
    """orders -> (r, c, n): priority rank 1..5 x declared price band
    0..3 (fixed integer-dollar thresholds 50k/150k/300k) cell counts.
    ONE map-side-combinable groupBy; 20 output rows."""
    o = T(spark, sf_dir, "orders")
    band = (F.when(F.col("o_totalprice") < 50000, 0)
            .when(F.col("o_totalprice") < 150000, 1)
            .when(F.col("o_totalprice") < 300000, 2)
            .otherwise(3))
    return (o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("r"),
        band.alias("c"))
        .groupBy("r", "c").agg(F.count("*").alias("n")))


_CELLS_SQL = """
    SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS r,
           CASE WHEN o_totalprice < 50000 THEN 0
                WHEN o_totalprice < 150000 THEN 1
                WHEN o_totalprice < 300000 THEN 2
                ELSE 3 END AS c,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
"""


# ------------------------------------------------ Cliff's delta

@query("stats_cliffs_delta", oracle="""
    WITH a AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS ca
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cb
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    m AS (
        SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca,
               coalesce(cb, 0) AS cb
        FROM a FULL JOIN b ON a.v = b.v
    ),
    w AS (
        SELECT ca, cb,
               coalesce(sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS b_less,
               coalesce(sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
                   0) AS b_greater
        FROM m
    ),
    s AS (
        SELECT CAST(sum(ca * b_less) AS BIGINT) AS wins,
               CAST(sum(ca * b_greater) AS BIGINT) AS losses,
               CAST(sum(ca * cb) AS BIGINT) AS ties,
               CAST(sum(ca) AS BIGINT) AS n1,
               CAST(sum(cb) AS BIGINT) AS n2
        FROM w
    )
    SELECT n1, n2, wins, losses, ties,
           round((wins - losses) / CAST(n1 * n2 AS DOUBLE), 6)
               AS cliffs_delta,
           round((wins + 0.5 * ties) / CAST(n1 * n2 AS DOUBLE), 6)
               AS vd_a
    FROM s
""")
def stats_cliffs_delta(spark, sf_dir):
    """Cliff's delta between click and purchase event values:
    delta = [#(x>y) - #(x<y)] / (n1*n2) over all cross pairs, plus
    the Vargha-Delaney A = P(X>Y) + 0.5*P(X=Y) twin (A = (delta+1)/2
    — both reported because the two literatures quote different
    conventions). |delta| ~ 0.147 / 0.33 / 0.474 are the canonical
    small/medium/large fences.

    NOT an n1*n2 pair enumeration: both samples collapse to their
    integer-cents VALUE GRID with frequencies; one full-outer merge
    of the two grids plus one ordered window gives, at each distinct
    value, how many B-observations sit strictly below/above; the
    pair counts are then frequency products. The window is over the
    merged grid, whose size is bounded by the value RANGE (cents),
    not the corpus — at 100 TB the grid is still ≤ ~20k rows, so the
    single-partition sort is a deliberate, bounded choice.

    Oracle states the identical grid/window/product formulation."""
    ev = T(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"))
    a = (ev.filter(F.col("event_type") == "click")
         .groupBy("v").agg(F.count("*").alias("ca")))
    b = (ev.filter(F.col("event_type") == "purchase")
         .groupBy("v").agg(F.count("*").alias("cb")))
    m = (a.join(b, "v", "full")
         .select("v",
                 F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    w_lt = (Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1))
    w_gt = (Window.orderBy("v")
            .rowsBetween(1, Window.unboundedFollowing))
    g = m.select(
        "ca", "cb",
        F.coalesce(F.sum("cb").over(w_lt), F.lit(0)).alias("b_less"),
        F.coalesce(F.sum("cb").over(w_gt), F.lit(0)).alias("b_greater"))
    s = g.agg(
        F.sum(F.col("ca") * F.col("b_less")).alias("wins"),
        F.sum(F.col("ca") * F.col("b_greater")).alias("losses"),
        F.sum(F.col("ca") * F.col("cb")).alias("ties"),
        F.sum("ca").alias("n1"), F.sum("cb").alias("n2"))
    n1n2 = (F.col("n1") * F.col("n2")).cast("double")
    return s.select(
        "n1", "n2", "wins", "losses", "ties",
        F.round((F.col("wins") - F.col("losses")) / n1n2, 6)
        .alias("cliffs_delta"),
        F.round((F.col("wins") + 0.5 * F.col("ties")) / n1n2, 6)
        .alias("vd_a"))


# ---------------------------------------- Goodman-Kruskal gamma

@query("stats_gk_gamma", oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    pairs AS (
        SELECT CAST(sum(CASE WHEN y.r > x.r AND y.c > x.c
                             THEN x.n * y.n ELSE 0 END) AS BIGINT)
                   AS conc,
               CAST(sum(CASE WHEN y.r > x.r AND y.c < x.c
                             THEN x.n * y.n ELSE 0 END) AS BIGINT)
                   AS disc
        FROM cells x, cells y
    )
    SELECT conc, disc,
           round((conc - disc) / CAST(conc + disc AS DOUBLE), 6)
               AS gamma
    FROM pairs
""")
def stats_gk_gamma(spark, sf_dir):
    """Goodman-Kruskal gamma between order priority rank (1=URGENT ..
    5=LOW) and the declared price band (integer-dollar fences
    50k/150k/300k): gamma = (C - D)/(C + D) over concordant/
    discordant cross pairs, all ties dropped — the ordinal "does
    urgency buy size" association. On TPC-H-shaped data priority is
    drawn independently of price, so gamma ~ 0 is the expected
    truth; the statistic's job here is the exact pair algebra.

    The fact table collapses to a 5x4 cell-count table (one
    map-side-combinable groupBy); C and D are frequency products
    over the 20x20 cell cross pairs, each unordered pair counted
    once via the y.r > x.r direction convention. Scale cost is the
    single groupBy; everything after is constant-size."""
    cells = _cells(spark, sf_dir)
    x = cells.alias("x")
    y = cells.alias("y")
    xy = x.crossJoin(F.broadcast(y))
    conc = F.sum(F.when((F.col("y.r") > F.col("x.r"))
                        & (F.col("y.c") > F.col("x.c")),
                        F.col("x.n") * F.col("y.n")).otherwise(0))
    disc = F.sum(F.when((F.col("y.r") > F.col("x.r"))
                        & (F.col("y.c") < F.col("x.c")),
                        F.col("x.n") * F.col("y.n")).otherwise(0))
    s = xy.agg(conc.alias("conc"), disc.alias("disc"))
    return s.select(
        "conc", "disc",
        F.round((F.col("conc") - F.col("disc"))
                / (F.col("conc") + F.col("disc")).cast("double"), 6)
        .alias("gamma"))


# ------------------------------------------------- Somers' D

@query("stats_somers_d", oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    pairs AS (
        SELECT CAST(sum(CASE WHEN y.r > x.r AND y.c > x.c
                             THEN x.n * y.n ELSE 0 END) AS BIGINT)
                   AS conc,
               CAST(sum(CASE WHEN y.r > x.r AND y.c < x.c
                             THEN x.n * y.n ELSE 0 END) AS BIGINT)
                   AS disc,
               CAST(sum(CASE WHEN y.c = x.c AND y.r > x.r
                             THEN x.n * y.n ELSE 0 END) AS BIGINT)
                   AS ties_y
        FROM cells x, cells y
    )
    SELECT conc, disc, ties_y,
           round((conc - disc)
                 / CAST(conc + disc + ties_y AS DOUBLE), 6)
               AS somers_d
    FROM pairs
""")
def stats_somers_d(spark, sf_dir):
    """Somers' D of price band (dependent Y) on priority rank
    (predictor X): D_yx = (C - D)/(C + D + T_y), where T_y counts
    pairs tied on the BAND but differing in priority — the
    asymmetric gamma that charges the statistic for the outcome's
    ties (and the rank form of 2·AUC - 1, which is why credit-risk
    scorecards quote it). Same 5x4 cell collapse as the gamma
    sibling; T_y adds one more frequency-product term over the same
    20x20 cross pairs (y.c = x.c, y.r > x.r — each tied pair once).
    |D| <= |gamma| always (same numerator, larger denominator)."""
    cells = _cells(spark, sf_dir)
    x = cells.alias("x")
    y = cells.alias("y")
    xy = x.crossJoin(F.broadcast(y))
    prod = F.col("x.n") * F.col("y.n")
    s = xy.agg(
        F.sum(F.when((F.col("y.r") > F.col("x.r"))
                     & (F.col("y.c") > F.col("x.c")), prod)
              .otherwise(0)).alias("conc"),
        F.sum(F.when((F.col("y.r") > F.col("x.r"))
                     & (F.col("y.c") < F.col("x.c")), prod)
              .otherwise(0)).alias("disc"),
        F.sum(F.when((F.col("y.c") == F.col("x.c"))
                     & (F.col("y.r") > F.col("x.r")), prod)
              .otherwise(0)).alias("ties_y"))
    return s.select(
        "conc", "disc", "ties_y",
        F.round((F.col("conc") - F.col("disc"))
                / (F.col("conc") + F.col("disc") + F.col("ties_y"))
                .cast("double"), 6)
        .alias("somers_d"))


# ----------------------------------- Theil uncertainty coefficient

@query("stats_uncertainty_coeff", oracle=f"""
    WITH cells AS ({_CELLS_SQL}),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
    hr AS (
        SELECT -sum((rn / nn) * ln(rn / nn)) AS h_r
        FROM (SELECT CAST(sum(n) AS DOUBLE) AS rn, r
              FROM cells GROUP BY r), tot
    ),
    hrc AS (
        SELECT -sum((CAST(c1.n AS DOUBLE) / nn)
                    * ln(CAST(c1.n AS DOUBLE) / cn)) AS h_r_c
        FROM cells c1
        JOIN (SELECT c, CAST(sum(n) AS DOUBLE) AS cn
              FROM cells GROUP BY c) cc ON c1.c = cc.c, tot
    )
    SELECT round(h_r, 6) AS h_r,
           round(h_r_c, 6) AS h_r_given_c,
           round((h_r - h_r_c) / h_r, 6) AS u_coeff
    FROM hr, hrc
""")
def stats_uncertainty_coeff(spark, sf_dir):
    """Theil's uncertainty coefficient U(priority | band): the share
    of the priority distribution's entropy that knowing the price
    band removes — U = (H(R) - H(R|C))/H(R), the asymmetric
    association that needs no ordinal structure at all (and the
    normalized mutual-information special case I(R;C)/H(R)). On the
    independent TPC-H draw U ~ 0; bounds 0 <= U <= 1 by Gibbs.

    Same 5x4 cell collapse; marginals are tiny re-aggregations of
    the 20-row cell table; entropies are exact count ratios through
    `ln`. One real shuffle (the cell groupBy), then constant-size
    algebra with broadcast scalar joins."""
    cells = _cells(spark, sf_dir)
    tot = cells.agg(F.sum("n").cast("double").alias("nn"))
    rmarg = cells.groupBy("r").agg(F.sum("n").cast("double").alias("rn"))
    cmarg = cells.groupBy("c").agg(F.sum("n").cast("double").alias("cn"))
    h_r = (rmarg.crossJoin(F.broadcast(tot))
           .agg((-F.sum((F.col("rn") / F.col("nn"))
                        * F.log(F.col("rn") / F.col("nn"))))
                .alias("h_r")))
    h_rc = (cells.join(F.broadcast(cmarg), "c")
            .crossJoin(F.broadcast(tot))
            .agg((-F.sum((F.col("n").cast("double") / F.col("nn"))
                         * F.log(F.col("n").cast("double")
                                 / F.col("cn"))))
                 .alias("h_r_c")))
    out = h_r.crossJoin(F.broadcast(h_rc))
    return out.select(
        F.round("h_r", 6).alias("h_r"),
        F.round("h_r_c", 6).alias("h_r_given_c"),
        F.round((F.col("h_r") - F.col("h_r_c")) / F.col("h_r"), 6)
        .alias("u_coeff"))
