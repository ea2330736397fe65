"""Financial-reporting pack (round 6, batch 83). The reference engine
(294 LoC of Rust delegating to SQLite, reference src/main.rs) has no
reporting surface; four Tier-C mission operators — the FP&A
computations every revenue warehouse serves, exact integer cents end
to end:

- fin_445_rollup: the retail 4-4-5 fiscal calendar (13-week quarters
  split 4+4+5) as PURE integer arithmetic on the epoch week (no
  calendar table needed: week w -> quarter w//13, period by the
  week-in-quarter cut), revenue rolled to fiscal (year, period).
- fin_mtd_qtd_ytd: the to-date triple at a pinned report day —
  period-, quarter-, and year-to-date revenue in the 4-4-5 calendar,
  each beside its same-span-last-year comparison (the YoY the board
  deck actually shows).
- fin_margin_waterfall: the revenue bridge gross -> discount -> net
  -> tax -> final per return status, every step snapped to integer
  cents PER LINE before aggregation (the order-free money rule,
  `numerics.py`).
- fin_price_volume_mix: the PVM bridge 1997 -> 1998 per brand:
  price effect (p2-p1)*q2 + volume effect (q2-q1)*p1 reconstruct
  the revenue delta EXACTLY up to an explicit unit-price rounding
  residual column (the identity is exact in the rationals; the
  residual makes the integer rounding auditable).

Scale shapes: all four are single grouped aggregates over the fact
scan (fiscal arithmetic is per-row integer math that pushes into the
scan projection); the to-date key reduces to one bounded fiscal-week
table first."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from .relational import T

# fiscal week = days since 1995-01-01 // 7; quarter = week // 13;
# period-in-quarter: weeks 0-3 -> 0, 4-7 -> 1, 8-12 -> 2 (4-4-5).
_FISCAL_SQL = """
    fo AS (
        SELECT datediff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) // 7 AS w,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    fiscal AS (
        SELECT w // 52 AS fy,
               (w % 52) // 13 AS fq,
               CASE WHEN (w % 13) < 4 THEN 0
                    WHEN (w % 13) < 8 THEN 1 ELSE 2 END AS fp_in_q,
               w, cents
        FROM fo
    )
"""

_REPORT_DAY = 2000          # pinned report date (day index)


def _fiscal(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = F.expr("datediff(CAST(o_orderdate AS DATE),"
               " DATE '1995-01-01') div 7")
    return (o.select(w.alias("w"),
                     F.round(F.col("o_totalprice") * 100).cast("bigint")
                     .alias("cents"))
            .select(F.expr("w div 52").alias("fy"),
                    F.expr("(w % 52) div 13").alias("fq"),
                    F.expr("CASE WHEN (w % 13) < 4 THEN 0"
                           " WHEN (w % 13) < 8 THEN 1 ELSE 2 END")
                    .alias("fp_in_q"),
                    "w", "cents"))


@query("fin_445_rollup", oracle=f"""
    WITH {_FISCAL_SQL}
    SELECT fy, fq * 3 + fp_in_q AS fp,
           count(*) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS rev_cents
    FROM fiscal GROUP BY 1, 2
""")
def fin_445_rollup(spark, sf_dir):
    """Revenue by 4-4-5 fiscal period: the retail calendar computed
    as pure integer arithmetic on the epoch week (quarter = week//13,
    period by the 4/8 week-in-quarter cuts) — no calendar dimension
    to join, the fiscal keys fold into the scan projection. One
    grouped sum of per-order integer cents."""
    f = _fiscal(spark, sf_dir)
    return (f.groupBy("fy", (F.col("fq") * 3 + F.col("fp_in_q"))
                      .alias("fp"))
            .agg(F.count("*").alias("n_orders"),
                 F.sum("cents").cast("bigint").alias("rev_cents")))


@query("fin_mtd_qtd_ytd", oracle=f"""
    WITH {_FISCAL_SQL},
    now AS (
        SELECT {_REPORT_DAY} // 7 AS wn,
               ({_REPORT_DAY} // 7) // 52 AS fy_n,
               (({_REPORT_DAY} // 7) % 52) // 13 AS fq_n,
               CASE WHEN (({_REPORT_DAY} // 7) % 13) < 4 THEN 0
                    WHEN (({_REPORT_DAY} // 7) % 13) < 8 THEN 1
                    ELSE 2 END AS fp_n
    )
    SELECT
        CAST(sum(CASE WHEN f.fy = n.fy_n AND f.fq = n.fq_n
                       AND f.fp_in_q = n.fp_n AND f.w <= n.wn
                      THEN f.cents ELSE 0 END) AS BIGINT) AS mtd_cents,
        CAST(sum(CASE WHEN f.fy = n.fy_n AND f.fq = n.fq_n
                       AND f.w <= n.wn
                      THEN f.cents ELSE 0 END) AS BIGINT) AS qtd_cents,
        CAST(sum(CASE WHEN f.fy = n.fy_n AND f.w <= n.wn
                      THEN f.cents ELSE 0 END) AS BIGINT) AS ytd_cents,
        CAST(sum(CASE WHEN f.fy = n.fy_n - 1 AND f.fq = n.fq_n
                       AND f.fp_in_q = n.fp_n AND f.w <= n.wn - 52
                      THEN f.cents ELSE 0 END) AS BIGINT)
            AS mtd_ly_cents,
        CAST(sum(CASE WHEN f.fy = n.fy_n - 1 AND f.fq = n.fq_n
                       AND f.w <= n.wn - 52
                      THEN f.cents ELSE 0 END) AS BIGINT)
            AS qtd_ly_cents,
        CAST(sum(CASE WHEN f.fy = n.fy_n - 1 AND f.w <= n.wn - 52
                      THEN f.cents ELSE 0 END) AS BIGINT)
            AS ytd_ly_cents
    FROM fiscal f CROSS JOIN now n
""")
def fin_mtd_qtd_ytd(spark, sf_dir):
    """The to-date triple at a pinned report day: period/quarter/year
    -to-date revenue in the 4-4-5 calendar, each with the
    same-span-last-year figure (the 52-week shift keeps fiscal
    periods aligned — the comparability property the 4-4-5 calendar
    exists to provide). One conditional aggregate over the fact scan
    with a broadcast scalar of fiscal 'now' keys."""
    f = _fiscal(spark, sf_dir)
    wn = _REPORT_DAY // 7
    fy_n, rem = wn // 52, wn % 52
    fq_n = rem // 13
    fp_n = 0 if (wn % 13) < 4 else (1 if (wn % 13) < 8 else 2)

    def span(fy_off, w_cut, with_q, with_p):
        cond = (F.col("fy") == fy_n + fy_off) & (F.col("w") <= w_cut)
        if with_q:
            cond &= F.col("fq") == fq_n
        if with_p:
            cond &= F.col("fp_in_q") == fp_n
        return F.sum(F.when(cond, F.col("cents")).otherwise(0)) \
            .cast("bigint")

    return f.agg(
        span(0, wn, True, True).alias("mtd_cents"),
        span(0, wn, True, False).alias("qtd_cents"),
        span(0, wn, False, False).alias("ytd_cents"),
        span(-1, wn - 52, True, True).alias("mtd_ly_cents"),
        span(-1, wn - 52, True, False).alias("qtd_ly_cents"),
        span(-1, wn - 52, False, False).alias("ytd_ly_cents"))


@query("fin_margin_waterfall", oracle="""
    WITH lines AS (
        SELECT l_returnflag AS status,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS gross,
               CAST(round(l_extendedprice * l_discount * 100)
                    AS BIGINT) AS disc,
               CAST(round(l_tax * 1000) AS BIGINT) AS tax_milli
        FROM lineitem
    ),
    stepped AS (
        SELECT status, gross, disc,
               gross - disc AS net1,
               (gross - disc) * tax_milli // 1000 AS tax
        FROM lines
    )
    SELECT status,
           CAST(sum(gross) AS BIGINT) AS gross_cents,
           CAST(sum(disc) AS BIGINT) AS discount_cents,
           CAST(sum(net1) AS BIGINT) AS net_cents,
           CAST(sum(tax) AS BIGINT) AS tax_cents,
           CAST(sum(net1 + tax) AS BIGINT) AS charged_cents,
           CAST(sum(disc) * 1000 // sum(gross) AS BIGINT)
               AS discount_rate_milli
    FROM stepped GROUP BY status
""")
def fin_margin_waterfall(spark, sf_dir):
    """Revenue bridge per return status: gross -> minus discount ->
    net -> plus tax -> charged, every step snapped to integer cents
    PER LINE before any aggregation (the order-free money rule) so
    the waterfall reconciles exactly: charged = net + tax by
    construction, discount rate in millis. One grouped aggregate."""
    li = T(spark, sf_dir, "lineitem")
    lines = li.select(
        F.col("l_returnflag").alias("status"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("gross"),
        F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("bigint").alias("disc"),
        F.round(F.col("l_tax") * 1000).cast("bigint").alias("tax_milli"))
    stepped = lines.select(
        "status", "gross", "disc",
        (F.col("gross") - F.col("disc")).alias("net1"),
        F.expr("(gross - disc) * tax_milli div 1000").alias("tax"))
    return (stepped.groupBy("status")
            .agg(F.sum("gross").cast("bigint").alias("gross_cents"),
                 F.sum("disc").cast("bigint").alias("discount_cents"),
                 F.sum("net1").cast("bigint").alias("net_cents"),
                 F.sum("tax").cast("bigint").alias("tax_cents"),
                 F.sum(F.col("net1") + F.col("tax")).cast("bigint")
                 .alias("charged_cents"),
                 F.expr("sum(disc) * 1000 div sum(gross)")
                 .cast("bigint").alias("discount_rate_milli")))


@query("fin_price_volume_mix", oracle="""
    WITH base AS (
        SELECT p.p_brand AS brand,
               year(CAST(o.o_orderdate AS DATE)) AS yr,
               CAST(l.l_quantity AS BIGINT) AS qty,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(CAST(o.o_orderdate AS DATE)) IN (1997, 1998)
    ),
    per AS (
        SELECT brand,
               CAST(sum(CASE WHEN yr = 1997 THEN qty ELSE 0 END)
                    AS BIGINT) AS q1,
               CAST(sum(CASE WHEN yr = 1998 THEN qty ELSE 0 END)
                    AS BIGINT) AS q2,
               CAST(sum(CASE WHEN yr = 1997 THEN cents ELSE 0 END)
                    AS BIGINT) AS r1,
               CAST(sum(CASE WHEN yr = 1998 THEN cents ELSE 0 END)
                    AS BIGINT) AS r2
        FROM base GROUP BY brand
        HAVING sum(CASE WHEN yr = 1997 THEN qty ELSE 0 END) > 0
           AND sum(CASE WHEN yr = 1998 THEN qty ELSE 0 END) > 0
    )
    SELECT brand, q1, q2, r1, r2,
           (r2 // q2 - r1 // q1) * q2 AS price_eff_cents,
           (q2 - q1) * (r1 // q1) AS volume_eff_cents,
           (r2 - r1) - (r2 // q2 - r1 // q1) * q2
                     - (q2 - q1) * (r1 // q1) AS residual_cents
    FROM per
""")
def fin_price_volume_mix(spark, sf_dir):
    """Price-volume-mix bridge 1997 -> 1998 per brand: with unit
    prices p = revenue // quantity, price effect (p2-p1)*q2 plus
    volume effect (q2-q1)*p1 telescopes to EXACTLY p2q2 - p1q1; the
    explicit residual column carries only the unit-price integer
    rounding (auditably small), so the three columns reconcile the
    revenue delta to the cent. One fact-scan aggregate per brand."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    p = T(spark, sf_dir, "part")
    yr = F.year(F.col("o_orderdate").cast("date"))
    base = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .where(yr.isin(1997, 1998))
            .select(F.col("p_brand").alias("brand"), yr.alias("yr"),
                    F.col("l_quantity").cast("bigint").alias("qty"),
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("bigint").alias("cents")))
    per = (base.groupBy("brand")
           .agg(F.sum(F.when(F.col("yr") == 1997, F.col("qty"))
                      .otherwise(0)).cast("bigint").alias("q1"),
                F.sum(F.when(F.col("yr") == 1998, F.col("qty"))
                      .otherwise(0)).cast("bigint").alias("q2"),
                F.sum(F.when(F.col("yr") == 1997, F.col("cents"))
                      .otherwise(0)).cast("bigint").alias("r1"),
                F.sum(F.when(F.col("yr") == 1998, F.col("cents"))
                      .otherwise(0)).cast("bigint").alias("r2"))
           .where((F.col("q1") > 0) & (F.col("q2") > 0)))
    return per.select(
        "brand", "q1", "q2", "r1", "r2",
        F.expr("(r2 div q2 - r1 div q1) * q2").alias("price_eff_cents"),
        F.expr("(q2 - q1) * (r1 div q1)").alias("volume_eff_cents"),
        F.expr("(r2 - r1) - (r2 div q2 - r1 div q1) * q2"
               " - (q2 - q1) * (r1 div q1)").alias("residual_cents"))
