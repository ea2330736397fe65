"""Data-profiling pack (round 6, batch 88). The reference engine (294
LoC of Rust delegating to SQLite, reference src/main.rs) profiles
nothing; four Tier-C mission operators — the schema-discovery scans a
profiler (Metanome-style) runs before anyone writes a join, extending
`profile_columns`/`dq_functional_dependency`:

- dq_inclusion_census: inclusion-dependency (FK candidate) discovery
  over a pinned column-pair lattice — distinct-value containment of
  A in B (micro), with a deliberate negative pair in the panel; the
  SPIDER-style scan that finds joinable keys.
- dq_key_discovery: uniqueness census over candidate key sets
  (singles and a pair) — NDV/rows micro per candidate, key verdict;
  notably documents that the synthetic corpus VIOLATES some nominal
  TPC-H keys (the `encoding` pack's duplicate discovery).
- dq_pattern_census: format-mask profiling — strings folded to
  A/a/9 masks (pinned replace order), top masks per column with
  counts; the scan that finds the '3% of rows have a weird format'
  problem.
- dq_orphan_audit: referential-integrity audit over the pinned FK
  panel — orphaned fact rows per relationship (anti-join counts)
  and micro orphan rates.

Scale shapes: containment and orphan checks are distinct-aggregate +
anti-join shapes (one shuffle each, broadcastable dims); masks fold
into the scan projection; every report is a bounded panel."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query
from .relational import T

_INCLUSIONS = (
    ("orders.o_custkey", "customer.c_custkey"),
    ("lineitem.l_partkey", "part.p_partkey"),
    ("lineitem.l_suppkey", "supplier.s_suppkey"),
    ("lineitem.l_orderkey", "orders.o_orderkey"),
    ("customer.c_custkey", "supplier.s_suppkey"),   # negative control
)


def _inc_branch_sql(frm, to):
    ft, fc = frm.split(".")
    tt, tc = to.split(".")
    return f"""
        SELECT '{frm}' AS from_col, '{to}' AS to_col,
               CAST((SELECT count(DISTINCT {fc}) FROM {ft}) AS BIGINT)
                   AS n_distinct_from,
               CAST((SELECT count(*) FROM
                     (SELECT DISTINCT {fc} AS k FROM {ft}) a
                     WHERE a.k IN (SELECT {tc} FROM {tt})) AS BIGINT)
                   AS n_contained
    """


@query("dq_inclusion_census", oracle=f"""
    WITH pairs AS (
        {" UNION ALL ".join(_inc_branch_sql(a, b) for a, b in _INCLUSIONS)}
    )
    SELECT from_col, to_col, n_distinct_from, n_contained,
           n_contained * 1000000 // n_distinct_from
               AS containment_micro,
           CASE WHEN n_contained = n_distinct_from THEN 1 ELSE 0 END
               AS is_inclusion
    FROM pairs
""")
def dq_inclusion_census(spark, sf_dir):
    """Inclusion-dependency discovery: for each candidate (A, B) pair
    the fraction of A's distinct values present in B — containment
    1e6 means A references B (an FK candidate); the panel carries a
    deliberate negative control (custkey vs suppkey). Each check is
    one distinct-aggregate + semi-join; the pair lattice is the
    pinned panel (full-lattice SPIDER prunes by min/max and type
    first — same per-pair shape).

    r11 (guide §5): the former 10 SEQUENTIAL driver-blocking counts
    (two eager .count()s per pair) are now five 1-row aggregate
    subtrees UNIONed into the one returned plan — both counts per
    pair come from a single distinct-left-join pass (count(*) over
    the distinct A side, count(m) the matched subset; B is distinct,
    so the left join is 1:1 and count(*) equals the old a.count()),
    and the five branches schedule concurrently inside one job
    instead of serializing through the driver."""
    branches = []
    for frm, to in _INCLUSIONS:
        ft, fc = frm.split(".")
        tt, tc = to.split(".")
        a = T(spark, sf_dir, ft).select(F.col(fc).alias("k")).distinct()
        b = (T(spark, sf_dir, tt).select(F.col(tc).alias("k")).distinct()
             .withColumn("m", F.lit(1)))
        branches.append(
            a.join(b, "k", "left")
            .agg(F.count("*").alias("n_distinct_from"),
                 F.count("m").alias("n_contained"))
            .select(F.lit(frm).alias("from_col"),
                    F.lit(to).alias("to_col"),
                    "n_distinct_from", "n_contained"))
    df = branches[0]
    for br in branches[1:]:
        df = df.unionByName(br)
    return df.select(
        "from_col", "to_col", "n_distinct_from", "n_contained",
        F.expr("n_contained * 1000000 div n_distinct_from")
        .alias("containment_micro"),
        F.when(F.col("n_contained") == F.col("n_distinct_from"), 1)
        .otherwise(0).alias("is_inclusion"))


_KEY_CANDS = (
    ("orders", "o_orderkey", "o_orderkey"),
    ("orders", "o_custkey", "o_custkey"),
    ("part", "p_partkey", "p_partkey"),
    ("customer", "c_custkey", "c_custkey"),
    ("lineitem", "(l_orderkey, l_linenumber)",
     "CAST(l_orderkey AS VARCHAR) || ':' "
     "|| CAST(l_linenumber AS VARCHAR)"),
)


@query("dq_key_discovery", oracle=f"""
    WITH cands AS (
        {" UNION ALL ".join(
            f"SELECT '{t}.{lbl}' AS candidate,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(DISTINCT {ex}) AS BIGINT) AS ndv FROM {t}"
            for t, lbl, ex in _KEY_CANDS)}
    )
    SELECT candidate, n_rows, ndv,
           ndv * 1000000 // n_rows AS uniqueness_micro,
           CASE WHEN ndv = n_rows THEN 1 ELSE 0 END AS is_key
    FROM cands
""")
def dq_key_discovery(spark, sf_dir):
    """Candidate-key census: NDV over row count for a pinned set of
    single columns and the classic (orderkey, linenumber) composite —
    a verdict column says which candidates actually hold as keys in
    THIS corpus (the synthetic generator violates some nominal TPC-H
    keys, which this scan is exactly the tool to catch). One
    distinct-aggregate per candidate.

    r11 (guide §5): formerly 10 SEQUENTIAL driver-blocking jobs (an
    eager .count() + distinct().count() per candidate); now five
    1-row count/count_distinct aggregates UNIONed into the one
    returned plan, scheduled concurrently inside a single job."""
    branches = []
    for t, lbl, ex in _KEY_CANDS:
        df = T(spark, sf_dir, t)
        k = F.expr(ex.replace("VARCHAR", "STRING"))
        branches.append(df.agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(k).alias("ndv"))
            .select(F.lit(f"{t}.{lbl}").alias("candidate"),
                    "n_rows", "ndv"))
    out = branches[0]
    for br in branches[1:]:
        out = out.unionByName(br)
    return out.select(
        "candidate", "n_rows", "ndv",
        F.expr("ndv * 1000000 div n_rows").alias("uniqueness_micro"),
        F.when(F.col("ndv") == F.col("n_rows"), 1).otherwise(0)
        .alias("is_key"))


@query("dq_pattern_census", oracle="""
    WITH vals AS (
        SELECT 'c_name' AS col, c_name AS v FROM customer
        UNION ALL
        SELECT 'p_brand', p_brand FROM part
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    masks AS (
        SELECT col,
               regexp_replace(regexp_replace(regexp_replace(v,
                   '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                   '[0-9]', '9', 'g') AS mask
        FROM vals
    ),
    counted AS (
        SELECT col, mask, CAST(count(*) AS BIGINT) AS n
        FROM masks GROUP BY col, mask
    )
    SELECT col, mask, n, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT col, mask, n,
               row_number() OVER (PARTITION BY col
                                  ORDER BY n DESC, mask) AS rnk
        FROM counted
    ) WHERE rnk <= 3
""")
def dq_pattern_census(spark, sf_dir):
    """Format-mask profiling: string values folded to A/a/9 masks
    (uppercase -> A, lowercase -> a, digits -> 9, pinned replace
    order), top-3 masks per column — the profile that surfaces
    format outliers before they break a parser. Masks fold into the
    scan projection; the census is a grouped count."""
    parts = []
    for tbl, col in (("customer", "c_name"), ("part", "p_brand"),
                     ("orders", "o_orderpriority")):
        parts.append(T(spark, sf_dir, tbl)
                     .select(F.lit(col).alias("col"),
                             F.col(col).alias("v")))
    vals = parts[0].unionByName(parts[1]).unionByName(parts[2])
    mask = F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.col("v"), "[A-Z]", "A"), "[a-z]", "a"), "[0-9]", "9")
    counted = (vals.select("col", mask.alias("mask"))
               .groupBy("col", "mask").agg(F.count("*").alias("n")))
    w = Window.partitionBy("col").orderBy(F.col("n").desc(),
                                          F.col("mask"))
    return (counted.withColumn("rnk", F.row_number().over(w)
                               .cast("bigint"))
            .where(F.col("rnk") <= 3)
            .select("col", "mask", "n", "rnk"))


_FKS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


@query("dq_orphan_audit", oracle=f"""
    WITH fks AS (
        {" UNION ALL ".join(
            f"SELECT '{ft}.{fc} -> {tt}.{tc}' AS fk,"
            f" CAST((SELECT count(*) FROM {ft}) AS BIGINT) AS n_rows,"
            f" CAST((SELECT count(*) FROM {ft}"
            f" WHERE {fc} NOT IN (SELECT {tc} FROM {tt})) AS BIGINT)"
            f" AS n_orphans"
            for ft, fc, tt, tc in _FKS)}
    )
    SELECT fk, n_rows, n_orphans,
           n_orphans * 1000000 // n_rows AS orphan_rate_micro
    FROM fks
""")
def dq_orphan_audit(spark, sf_dir):
    """Referential-integrity audit: per declared FK relationship the
    count and micro rate of fact rows whose key has no match in the
    dimension (anti-join). Zero everywhere = the join graph is safe
    to inner-join; anything else quantifies the rows an inner join
    silently drops. Anti-joins with broadcastable dimension sides.

    r11 (guide §5): formerly 8 SEQUENTIAL driver-blocking counts (an
    eager fact .count() + anti-join .count() per FK); now four 1-row
    aggregate subtrees UNIONed into the one returned plan, each a
    single left join against the DISTINCT dim keys (distinct keeps
    the join 1:1 — dq_key_discovery documents that the generator
    violates some nominal keys, and a duplicated dim key would
    inflate both counts) with n_orphans = count(*) - count(match),
    exactly the anti-join count."""
    branches = []
    for ft, fc, tt, tc in _FKS:
        fact = T(spark, sf_dir, ft).select(F.col(fc).alias("k"))
        dim = (T(spark, sf_dir, tt).select(F.col(tc).alias("k"))
               .distinct().withColumn("m", F.lit(1)))
        branches.append(
            fact.join(F.broadcast(dim), "k", "left")
            .agg(F.count("*").alias("n_rows"),
                 (F.count("*") - F.count("m")).alias("n_orphans"))
            .select(F.lit(f"{ft}.{fc} -> {tt}.{tc}").alias("fk"),
                    "n_rows", "n_orphans"))
    out = branches[0]
    for br in branches[1:]:
        out = out.unionByName(br)
    return out.select(
        "fk", "n_rows", "n_orphans",
        F.expr("n_orphans * 1000000 div n_rows")
        .alias("orphan_rate_micro"))
