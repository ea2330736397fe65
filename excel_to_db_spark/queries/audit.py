"""Distribution-free CI / corpus-linguistics / audit pack (round 5,
batch 32): an order-statistic confidence interval for the median,
per-token burstiness, a Simpson's-paradox reversal census, and a
group-fairness audit. The reference engine (294 LoC of Rust
delegating to SQLite, reference src/main.rs) has none of this
surface; these are Tier-C mission operators:

- The distribution-free median CI picks ORDER STATISTICS as bounds
  (binomial ranks) — valid with no distributional assumption, the
  right interval for skewed warehouse metrics.
- Burstiness (Church & Gale 1995) separates topical words (appear
  many times in few docs) from function words (spread thin) — a
  one-pass corpus-linguistics profile every curation team runs.
- The Simpson audit counts strata whose association SIGN disagrees
  with the pooled sign — the tabular early-warning for aggregation
  reversals, in pure integer arithmetic.
- The fairness audit reports per-group selection rates and TPR/FPR
  with the demographic-parity and equalized-odds gaps — the standard
  group-fairness panel (Hardt et al. 2016) for any classifier gate.

Determinism contract (SURVEY §4.3): rank bounds, per-stratum sign
products, and confusion cells are exact integers; ratios snap once;
gap selections compare snapped values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from .relational import T


# ------------------------------- distribution-free median CI

@query("stats_median_ci", oracle="""
    WITH v AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    dims AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               -- normal-approx binomial ranks for a ~95% CI:
               -- l = floor(n/2 - 0.98*sqrt(n)), u = ceil(n/2 + 0.98*sqrt(n)) + 1
               CAST(floor(count(*) / 2.0
                          - 0.98 * sqrt(count(*))) AS BIGINT) AS lo_rank,
               CAST(ceil(count(*) / 2.0
                         + 0.98 * sqrt(count(*))) AS BIGINT) + 1
                   AS hi_rank
        FROM v
    ),
    ranked AS (
        SELECT c, CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS rk
        FROM v
    ),
    pick AS (
        SELECT CAST(max(CASE WHEN rk = lo_rank THEN c END) AS BIGINT)
                   AS lo_c,
               CAST(max(CASE WHEN rk = hi_rank THEN c END) AS BIGINT)
                   AS hi_c,
               CAST(max(CASE WHEN 2 * rk = n OR 2 * rk = n + 1
                             OR 2 * rk = n + 2 THEN c END) AS BIGINT)
                   AS med_hi
        FROM ranked, dims
    )
    SELECT n, lo_rank, hi_rank,
           round(lo_c / 100.0, 2) AS ci_low,
           round(hi_c / 100.0, 2) AS ci_high,
           round(med_hi / 100.0, 2) AS median_upper
    FROM pick, dims
""")
def stats_median_ci(spark, sf_dir):
    """Distribution-free ~95% confidence interval for the median of
    event values via order statistics: the binomial argument puts the
    true median between the floor(n/2 - z/2*sqrt(n)) and
    ceil(n/2 + z/2*sqrt(n)) + 1 order statistics with ~95% coverage
    (z=1.96 => 0.98*sqrt(n)), with NO distributional assumption —
    the right interval for skewed warehouse metrics where a
    normal-theory CI on the mean answers the wrong question.

    Rank bounds are exact integer expressions of n; the three order
    statistics are picked by exact rank equality from one global rank
    pass (values are integer cents, ranks pinned by (value) order —
    equal values share the quantile, so any tie choice yields the
    same cents). median_upper is the upper-median order statistic.

    Scale shape: one rank pass over the value column + a 1-row
    conditional-max reduce. (At 100 TB the rank pass would use the
    repo's distributed_rank; the direct window keeps this key's
    oracle 1:1 and the value histogram bounded.)"""
    v = T(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("c"))
    dims = v.agg(
        F.count("*").alias("n"),
        F.floor(F.count("*") / 2.0
                - 0.98 * F.sqrt(F.count("*"))).cast("bigint")
         .alias("lo_rank"),
        (F.ceil(F.count("*") / 2.0
                + 0.98 * F.sqrt(F.count("*"))).cast("bigint") + 1)
         .alias("hi_rank"))
    from ..operators.ranking import distributed_rank
    ranked = distributed_rank(v, "c", "c", rank_col="rk")
    pick = (ranked.crossJoin(F.broadcast(dims))
            .agg(F.max(F.when(F.col("rk") == F.col("lo_rank"),
                              F.col("c"))).alias("lo_c"),
                 F.max(F.when(F.col("rk") == F.col("hi_rank"),
                              F.col("c"))).alias("hi_c"),
                 F.max(F.when((2 * F.col("rk") == F.col("n"))
                              | (2 * F.col("rk") == F.col("n") + 1)
                              | (2 * F.col("rk") == F.col("n") + 2),
                              F.col("c"))).alias("med_hi")))
    return (pick.crossJoin(F.broadcast(dims))
            .select("n", "lo_rank", "hi_rank",
                    F.round(F.col("lo_c") / 100.0, 2).alias("ci_low"),
                    F.round(F.col("hi_c") / 100.0, 2).alias("ci_high"),
                    F.round(F.col("med_hi") / 100.0, 2)
                    .alias("median_upper")))


# ------------------------------------------------- token burstiness

@query("text_burstiness", oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS docs
           FROM tok),
    stats AS (
        SELECT t, CAST(count(*) AS BIGINT) AS cf,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY t
    )
    SELECT t AS token, cf, df,
           round(cf * 1.0 / df, 6) AS burstiness,
           round(df * 1.0
                 / (docs * (1.0 - exp(-(cf * 1.0 / docs)))), 6)
               AS df_vs_poisson,
           round(df * 1.0
                 / (docs * (1.0 - exp(-(cf * 1.0 / docs)))), 6) < 1.0
               AS bursty
    FROM stats, nd
    ORDER BY t
""")
def text_burstiness(spark, sf_dir):
    """Per-token burstiness profile (Church & Gale 1995): burstiness =
    cf/df (mean occurrences per CONTAINING document) plus the
    Poisson-null document-frequency ratio df / (D * (1 - e^-lambda))
    with lambda = cf/D — under even Poisson spread the ratio is ~1;
    topical words concentrate (ratio < 1, flagged bursty), function
    words spread thin. This is the one-pass corpus-linguistics
    profile that separates content from glue vocabulary.

    cf/df are exact integers from one grouped aggregate (df via
    count(DISTINCT doc) — at 100 TB, swap for the repo's mergeable
    distinct sketches per token); the two ratios are single snapped
    expressions, and the bursty flag compares the SNAPPED ratio so
    both engines decide identically (SURVEY §4.3).

    Scale shape: one explode + one (token) aggregate — the standard
    text histogram shape; output bounded by vocabulary size."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    nd = tok.agg(F.countDistinct("doc_id").alias("docs"))
    stats = (tok.groupBy("t")
             .agg(F.count("*").alias("cf"),
                  F.countDistinct("doc_id").alias("df")))
    ratio = F.round(
        F.col("df") * 1.0
        / (F.col("docs")
           * (1.0 - F.exp(-(F.col("cf") * 1.0 / F.col("docs"))))), 6)
    return (stats.crossJoin(F.broadcast(nd))
            .select(F.col("t").alias("token"), "cf", "df",
                    F.round(F.col("cf") * 1.0 / F.col("df"), 6)
                    .alias("burstiness"),
                    ratio.alias("df_vs_poisson"),
                    (ratio < 1.0).alias("bursty"))
            .orderBy("token"))


# ------------------------------------- Simpson's-paradox reversal audit

@query("stats_simpson_audit", oracle="""
    WITH rows_ AS (
        SELECT c.c_nationkey AS stratum,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS x,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    tabs AS (
        SELECT stratum,
               CAST(sum(x * y) AS BIGINT) AS a,
               CAST(sum(x * (1 - y)) AS BIGINT) AS b,
               CAST(sum((1 - x) * y) AS BIGINT) AS c,
               CAST(sum((1 - x) * (1 - y)) AS BIGINT) AS d
        FROM rows_ GROUP BY stratum
    ),
    pooled AS (
        SELECT CAST(sum(a) AS BIGINT) AS pa, CAST(sum(b) AS BIGINT) AS pb,
               CAST(sum(c) AS BIGINT) AS pc, CAST(sum(d) AS BIGINT) AS pd
        FROM tabs
    ),
    signed AS (
        SELECT stratum, a, b, c, d,
               CASE WHEN a * d > b * c THEN 1
                    WHEN a * d < b * c THEN -1 ELSE 0 END AS s_sign,
               CASE WHEN pa * pd > pb * pc THEN 1
                    WHEN pa * pd < pb * pc THEN -1 ELSE 0 END AS p_sign
        FROM tabs, pooled
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           max(p_sign) AS pooled_sign,
           CAST(sum(CASE WHEN s_sign = p_sign AND s_sign <> 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           CAST(sum(CASE WHEN s_sign = -p_sign AND s_sign <> 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed,
           CAST(sum(CASE WHEN s_sign = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null
    FROM signed
""")
def stats_simpson_audit(spark, sf_dir):
    """Simpson's-paradox reversal census: for each customer nation,
    the SIGN of the priority-vs-finished association (the exact
    integer cross-product a*d - b*c of its 2x2 table) is compared to
    the pooled table's sign — strata whose association points the
    OTHER way are counted as reversals. A nonzero n_reversed is the
    early warning that the pooled number hides heterogeneity (and
    that collapsing strata — what stats_cmh_test refuses to do —
    would mislead).

    Every decision is an exact BIGINT comparison (cross-products,
    never odds ratios — no division, no zero-cell blowups); the
    census is therefore bit-deterministic by construction.

    Scale shape: one fact x broadcast-dim join, one conditional-count
    aggregate to stratum rows, one 1-row census reduce."""
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    x = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
         .otherwise(0)
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    rows_ = (o.join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
             .select(F.col("c_nationkey").alias("stratum"),
                     x.alias("x"), y.alias("y")))
    tabs = (rows_.groupBy("stratum")
            .agg(F.sum(F.col("x") * F.col("y")).alias("a"),
                 F.sum(F.col("x") * (1 - F.col("y"))).alias("b"),
                 F.sum((1 - F.col("x")) * F.col("y")).alias("c"),
                 F.sum((1 - F.col("x")) * (1 - F.col("y")))
                 .alias("d")))
    pooled = tabs.agg(F.sum("a").alias("pa"), F.sum("b").alias("pb"),
                      F.sum("c").alias("pc"), F.sum("d").alias("pd"))
    s_sign = (F.when(F.col("a") * F.col("d") > F.col("b") * F.col("c"),
                     1)
              .when(F.col("a") * F.col("d") < F.col("b") * F.col("c"),
                    -1).otherwise(0))
    p_sign = (F.when(F.col("pa") * F.col("pd")
                     > F.col("pb") * F.col("pc"), 1)
              .when(F.col("pa") * F.col("pd")
                    < F.col("pb") * F.col("pc"), -1).otherwise(0))
    signed = (tabs.crossJoin(F.broadcast(pooled))
              .select("stratum", s_sign.alias("s_sign"),
                      p_sign.alias("p_sign")))
    return signed.agg(
        F.count("*").alias("n_strata"),
        F.max("p_sign").alias("pooled_sign"),
        F.sum(F.when((F.col("s_sign") == F.col("p_sign"))
                     & (F.col("s_sign") != 0), 1).otherwise(0))
         .alias("n_agree"),
        F.sum(F.when((F.col("s_sign") == -F.col("p_sign"))
                     & (F.col("s_sign") != 0), 1).otherwise(0))
         .alias("n_reversed"),
        F.sum(F.when(F.col("s_sign") == 0, 1).otherwise(0))
         .alias("n_null"))


# ---------------------------------------------- group-fairness audit

@query("eval_fairness_audit", oracle="""
    WITH rated AS (
        SELECT lang AS grp,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pred,
               CASE WHEN length(text) - length(replace(text, 'e', ''))
                    >= 30 THEN 1 ELSE 0 END AS lab
        FROM documents
    ),
    per AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pred) AS BIGINT) AS n_sel,
               CAST(sum(pred * lab) AS BIGINT) AS tp,
               CAST(sum(pred * (1 - lab)) AS BIGINT) AS fp,
               CAST(sum(lab) AS BIGINT) AS pos,
               CAST(count(*) - sum(lab) AS BIGINT) AS neg
        FROM rated GROUP BY grp
    ),
    rates AS (
        SELECT grp, n, n_sel,
               round(n_sel * 1.0 / n, 6) AS sel_rate,
               round(tp * 1.0 / pos, 6) AS tpr,
               round(fp * 1.0 / neg, 6) AS fpr
        FROM per
    ),
    gaps AS (
        SELECT round(max(sel_rate) - min(sel_rate), 6) AS dp_gap,
               round(greatest(max(tpr) - min(tpr),
                              max(fpr) - min(fpr)), 6) AS eo_gap
        FROM rates
    )
    SELECT grp, n, n_sel, sel_rate, tpr, fpr, dp_gap, eo_gap
    FROM rates, gaps
    ORDER BY grp
""")
def eval_fairness_audit(spark, sf_dir):
    """Group-fairness audit of the length gate (predict if n_chars >=
    300) across language groups, against the 'e'-density label: per
    group the selection rate, TPR and FPR, plus the demographic-parity
    gap (max - min selection rate; Dwork et al. 2012) and the
    equalized-odds gap (max over the TPR and FPR spreads; Hardt et
    al. 2016) — the standard panel for "does this filter treat
    language groups alike", which is exactly the audit a multilingual
    curation gate owes its corpus.

    Per-group confusion cells are exact integers from ONE aggregate;
    rates snap per group, and the gap rows compare snapped rates
    (SURVEY §4.3) — so the fleet-wide gaps are deterministic
    selections over the 5-row group table.

    Scale shape: one map-side-combinable conditional-count aggregate
    + scalar gap math on the group rows."""
    d = T(spark, sf_dir, "documents")
    pred = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    lab = F.when(
        F.length("text") - F.length(F.regexp_replace("text", "e", ""))
        >= 30, 1).otherwise(0)
    rated = d.select(F.col("lang").alias("grp"),
                     pred.alias("pred"), lab.alias("lab"))
    per = (rated.groupBy("grp")
           .agg(F.count("*").alias("n"),
                F.sum("pred").alias("n_sel"),
                F.sum(F.col("pred") * F.col("lab")).alias("tp"),
                F.sum(F.col("pred") * (1 - F.col("lab"))).alias("fp"),
                F.sum("lab").alias("pos"),
                (F.count("*") - F.sum("lab")).alias("neg")))
    rates = per.select(
        "grp", "n", "n_sel",
        F.round(F.col("n_sel") * 1.0 / F.col("n"), 6).alias("sel_rate"),
        F.round(F.col("tp") * 1.0 / F.col("pos"), 6).alias("tpr"),
        F.round(F.col("fp") * 1.0 / F.col("neg"), 6).alias("fpr"))
    gaps = rates.agg(
        F.round(F.max("sel_rate") - F.min("sel_rate"), 6)
         .alias("dp_gap"),
        F.round(F.greatest(F.max("tpr") - F.min("tpr"),
                           F.max("fpr") - F.min("fpr")), 6)
         .alias("eo_gap"))
    return (rates.crossJoin(F.broadcast(gaps))
            .select("grp", "n", "n_sel", "sel_rate", "tpr", "fpr",
                    "dp_gap", "eo_gap")
            .orderBy("grp"))
