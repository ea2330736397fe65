"""Distribution-distance pack (round 6, batch 63). The reference
engine (294 LoC of Rust delegating to SQLite, reference src/main.rs)
has none of this surface; these are Tier-C mission operators — the
two-sample distances a 100 TB curation pipeline runs to decide
whether two corpus slices were drawn from the same distribution
(drift detection between snapshots, source mixing audits, A/B
invariance checks). The repo's `stats_ks_two_sample` reports the KS
sup-distance; these four report the rest of the canon:

- Kuiper V (1960): D+ + D- — the rotation-invariant KS variant that
  keeps tail sensitivity symmetric (KS under-weights whichever tail
  the sup lands away from).
- Cramér-von Mises T (Anderson 1962): the INTEGRAL of (F1-F2)²
  against the pooled empirical CDF — sensitive to many small
  departures where KS sees only the single worst one.
- Anderson-Darling A² (Pettitt 1976, pooled-CDF integral form): CvM
  with 1/(H(1-H)) re-weighting — the tail-magnifying member of the
  family.
- Wasserstein-1 + energy distance (Székely & Rizzo 2004): the
  metric-aware pair — W1 is the area between the CDFs (the "how far
  must mass move" number ML drift monitors quote), energy distance
  its double-integral cousin with the exact 1D closed form.

Determinism contract (SURVEY §4.3): values snap to integer cents;
every CDF comparison is an EXACT INTEGER cross-multiplication
X_k = A_k*n2 - B_k*n1 (never a float CDF subtraction); integral
terms are per-grid-point doubles built from those integers, snapped
at 1e12 and summed as integers; outputs round at 6 decimals.

Scale shapes: everything collapses both samples to the merged
distinct-cents VALUE GRID (range-bounded — ≤ ~20k rows however big
the corpus) and takes ONE ordered window over that grid; the
single-partition sort is bounded by the value range, not the data.
No pairwise enumeration anywhere — the energy-distance double sums
use the 1D cumulative closed forms."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .relational import T


def _grid(spark, sf_dir, t1="click", t2="purchase"):
    """Merged distinct-cents grid of two event-type samples with
    per-value counts (ca, cb), right-continuous cumulative counts
    (cuma, cumb), the next grid value (nxt), and broadcast totals
    (n1, n2). ONE shuffle to the grid + one bounded ordered window."""
    ev = T(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"))
    a = (ev.filter(F.col("event_type") == t1)
         .groupBy("v").agg(F.count("*").alias("ca")))
    b = (ev.filter(F.col("event_type") == t2)
         .groupBy("v").agg(F.count("*").alias("cb")))
    m = (a.join(b, "v", "full")
         .select("v",
                 F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = m.select(
        "v", "ca", "cb",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
        F.lead("v").over(Window.orderBy("v")).alias("nxt"))
    tot = m.agg(F.sum("ca").alias("n1"), F.sum("cb").alias("n2"))
    return g.crossJoin(F.broadcast(tot))


_GRID_SQL = """
    a AS (
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
    tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n1,
               CAST(sum(cb) AS BIGINT) AS n2
        FROM m
    ),
    g AS (
        SELECT v, ca, cb,
               sum(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cuma,
               sum(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumb,
               lead(v) OVER (ORDER BY v) AS nxt
        FROM m
    ),
    gg AS (SELECT g.*, n1, n2 FROM g, tot)
"""


# ---------------------------------------------------- Kuiper V

@query("stats_kuiper_two_sample", oracle=f"""
    WITH {_GRID_SQL}
    SELECT max(n1) AS n1, max(n2) AS n2,
           CAST(greatest(max(cuma * n2 - cumb * n1), 0) AS BIGINT)
               AS d_plus_num,
           CAST(greatest(max(cumb * n1 - cuma * n2), 0) AS BIGINT)
               AS d_minus_num,
           round((greatest(max(cuma * n2 - cumb * n1), 0)
                  + greatest(max(cumb * n1 - cuma * n2), 0))
                 / CAST(max(n1) * max(n2) AS DOUBLE), 6) AS v_stat
    FROM gg
""")
def stats_kuiper_two_sample(spark, sf_dir):
    """Kuiper V between click and purchase values: V = D+ + D- with
    D+ = sup(F1 - F2), D- = sup(F2 - F1). Each sup is a MAX over the
    merged grid of the exact integer cross-product
    cuma*n2 - cumb*n1 (right-continuous CDFs; the float division by
    n1*n2 happens once, after the max) — the statistic is exact up
    to the final 6-decimal round. The integer numerators are also
    reported so the oracle comparison is exact. Where KS quotes
    max(D+, D-), Kuiper's sum keeps both tails in the statistic —
    V >= KS always (tested)."""
    g = _grid(spark, sf_dir)
    x = F.col("cuma") * F.col("n2") - F.col("cumb") * F.col("n1")
    s = g.agg(F.max("n1").alias("n1"), F.max("n2").alias("n2"),
              F.greatest(F.max(x), F.lit(0)).alias("d_plus_num"),
              F.greatest(F.max(-x), F.lit(0)).alias("d_minus_num"))
    return s.select(
        "n1", "n2", "d_plus_num", "d_minus_num",
        F.round((F.col("d_plus_num") + F.col("d_minus_num"))
                / (F.col("n1") * F.col("n2")).cast("double"), 6)
        .alias("v_stat"))


# ------------------------------------------- Cramér-von Mises

@query("stats_cvm_two_sample", oracle=f"""
    WITH {_GRID_SQL},
    terms AS (
        SELECT CAST(round(
                   (ca + cb)
                   * CAST(cuma * n2 - cumb * n1 AS DOUBLE)
                   * CAST(cuma * n2 - cumb * n1 AS DOUBLE)
                   / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * n1 * n2)
                   * 1e12) AS BIGINT) AS snapped
        FROM gg
    )
    SELECT CAST(sum(snapped) AS BIGINT) AS t_snapped,
           round(CAST(sum(snapped) AS DOUBLE) / 1e12, 6) AS cvm_t
    FROM terms
""")
def stats_cvm_two_sample(spark, sf_dir):
    """Two-sample Cramér-von Mises in the pooled-CDF integral form
    (tie-safe): T = (n1*n2/N) * INT (F1-F2)^2 dH_N
    = SUM_k w_k * X_k^2 / (N^2 * n1 * n2), where X_k is the exact
    integer cross-product cuma*n2 - cumb*n1 and w_k = ca+cb the
    pooled mass at grid point k. Each term is a double built from
    exact integers (X cast to double BEFORE squaring — X^2 can pass
    2^53, so the square must be the same IEEE double product on both
    engines), snapped at 1e12, and summed exactly as integers — the
    cross-engine sum is order-independent by construction. Where KS
    sees only the worst point, T integrates every departure."""
    g = _grid(spark, sf_dir)
    xd = (F.col("cuma") * F.col("n2")
          - F.col("cumb") * F.col("n1")).cast("double")
    nn = (F.col("n1") + F.col("n2")).cast("double")
    term = ((F.col("ca") + F.col("cb")) * xd * xd
            / (nn * (F.col("n1") + F.col("n2"))
               * F.col("n1") * F.col("n2")))
    snapped = F.round(term * 1e12).cast("bigint")
    s = g.select(snapped.alias("snapped")).agg(
        F.sum("snapped").alias("t_snapped"))
    return s.select(
        "t_snapped",
        F.round(F.col("t_snapped").cast("double") / 1e12, 6)
        .alias("cvm_t"))


# ------------------------------------------ Anderson-Darling

@query("stats_ad_two_sample", oracle=f"""
    WITH {_GRID_SQL},
    terms AS (
        SELECT CAST(round(
                   (ca + cb)
                   * CAST(cuma * n2 - cumb * n1 AS DOUBLE)
                   * CAST(cuma * n2 - cumb * n1 AS DOUBLE)
                   * (n1 + n2)
                   / (CAST(n1 AS DOUBLE) * n2
                      * (cuma + cumb) * (n1 + n2 - cuma - cumb))
                   * 1e12) AS BIGINT) AS snapped
        FROM gg
        WHERE cuma + cumb < n1 + n2
    )
    SELECT CAST(sum(snapped) AS BIGINT) AS a2_snapped,
           round(CAST(sum(snapped) AS DOUBLE) / 1e12, 6) AS ad_a2
    FROM terms
""")
def stats_ad_two_sample(spark, sf_dir):
    """Two-sample Anderson-Darling in the pooled-CDF integral form
    (Pettitt 1976, tie-safe discrete weights): A² = (n1*n2/N) *
    INT (F1-F2)^2 / (H(1-H)) dH_N = SUM_k w_k * X_k^2 * N /
    (n1*n2*H_k*(N-H_k)) over grid points with pooled cumulative
    H_k < N (the last point contributes 0/0 and is excluded — F1 =
    F2 = 1 there). The 1/(H(1-H)) weight blows up at the tails,
    which is exactly the point: AD notices tail drift that CvM's
    uniform weight averages away. Same exact-integer X_k, same
    1e12-snap-and-integer-sum determinism as the CvM sibling."""
    g = _grid(spark, sf_dir)
    xd = (F.col("cuma") * F.col("n2")
          - F.col("cumb") * F.col("n1")).cast("double")
    h = F.col("cuma") + F.col("cumb")
    nn = F.col("n1") + F.col("n2")
    term = ((F.col("ca") + F.col("cb")) * xd * xd * nn
            / (F.col("n1").cast("double") * F.col("n2")
               * h * (nn - h)))
    snapped = F.round(term * 1e12).cast("bigint")
    s = (g.filter(h < nn)
         .select(snapped.alias("snapped"))
         .agg(F.sum("snapped").alias("a2_snapped")))
    return s.select(
        "a2_snapped",
        F.round(F.col("a2_snapped").cast("double") / 1e12, 6)
        .alias("ad_a2"))


# -------------------------------- Wasserstein-1 + energy distance

@query("stats_wasserstein_energy", oracle=f"""
    WITH {_GRID_SQL},
    seg AS (
        SELECT (nxt - v) AS gap, cuma, cumb, n1, n2
        FROM gg WHERE nxt IS NOT NULL
    ),
    sums AS (
        SELECT CAST(sum(abs(cuma * n2 - cumb * n1) * gap) AS BIGINT)
                   AS w1_num,
               CAST(sum((cuma * (n2 - cumb) + cumb * (n1 - cuma))
                        * gap) AS BIGINT) AS exy_num,
               CAST(sum(cuma * (n1 - cuma) * gap) AS BIGINT)
                   AS exx_num,
               CAST(sum(cumb * (n2 - cumb) * gap) AS BIGINT)
                   AS eyy_num,
               max(n1) AS n1, max(n2) AS n2
        FROM seg
    )
    SELECT round(w1_num / (CAST(n1 AS DOUBLE) * n2) / 100, 6)
               AS w1_dollars,
           round(exy_num / (CAST(n1 AS DOUBLE) * n2) / 100, 6)
               AS e_xy,
           round(2.0 * exx_num / (CAST(n1 AS DOUBLE) * n1) / 100, 6)
               AS e_xx,
           round(2.0 * eyy_num / (CAST(n2 AS DOUBLE) * n2) / 100, 6)
               AS e_yy,
           round((2.0 * exy_num / (CAST(n1 AS DOUBLE) * n2)
                  - 2.0 * exx_num / (CAST(n1 AS DOUBLE) * n1)
                  - 2.0 * eyy_num / (CAST(n2 AS DOUBLE) * n2))
                 / 100, 6) AS energy_dist
    FROM sums
""")
def stats_wasserstein_energy(spark, sf_dir):
    """Wasserstein-1 and energy distance between click and purchase
    values, both from 1D closed forms over the grid's CDF segments
    (gap = distance to the next distinct value):

      W1      = SUM |F1-F2| * gap          (area between the CDFs)
      E|X-Y|  = SUM [F1(1-F2) + F2(1-F1)] * gap
      energy  = 2E|X-Y| - E|X-X'| - E|Y-Y'|   (>= 0, = 0 iff equal)

    Every integrand is an exact integer product of cumulative counts
    and the integer cent gap (the float division by n1*n2 happens
    once per output); the four integer numerators sum exactly, so
    the statistic is deterministic to the final 6-decimal round.
    Outputs are in dollars (the /100). The no-pair-enumeration
    identity E|X-Y| = INT F1(1-F2)+F2(1-F1) dx is what makes the
    O(n^2) double sum a single grid pass — the same trick at 100 TB.
    Energy distance and W1 disagree exactly when drift is
    REARRANGEMENT rather than SHIFT; reporting both is the point."""
    g = _grid(spark, sf_dir)
    seg = (g.filter(F.col("nxt").isNotNull())
           .select((F.col("nxt") - F.col("v")).alias("gap"),
                   "cuma", "cumb", "n1", "n2"))
    x = F.col("cuma") * F.col("n2") - F.col("cumb") * F.col("n1")
    exy = (F.col("cuma") * (F.col("n2") - F.col("cumb"))
           + F.col("cumb") * (F.col("n1") - F.col("cuma")))
    s = seg.agg(
        F.sum(F.abs(x) * F.col("gap")).alias("w1_num"),
        F.sum(exy * F.col("gap")).alias("exy_num"),
        F.sum(F.col("cuma") * (F.col("n1") - F.col("cuma"))
              * F.col("gap")).alias("exx_num"),
        F.sum(F.col("cumb") * (F.col("n2") - F.col("cumb"))
              * F.col("gap")).alias("eyy_num"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    e_xy = 2.0 * F.col("exy_num") / (n1d * F.col("n2"))
    e_xx = 2.0 * F.col("exx_num") / (n1d * F.col("n1"))
    e_yy = 2.0 * F.col("eyy_num") / (n2d * F.col("n2"))
    return s.select(
        F.round(F.col("w1_num") / (n1d * F.col("n2")) / 100, 6)
        .alias("w1_dollars"),
        F.round(F.col("exy_num") / (n1d * F.col("n2")) / 100, 6)
        .alias("e_xy"),
        F.round(e_xx / 100, 6).alias("e_xx"),
        F.round(e_yy / 100, 6).alias("e_yy"),
        F.round((e_xy - e_xx - e_yy) / 100, 6).alias("energy_dist"))
