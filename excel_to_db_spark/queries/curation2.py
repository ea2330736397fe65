"""Corpus-governance operators (round 5, batch 2): the bookkeeping a
training-data pipeline runs around the curation steps — leakage-free
train/val/test splitting, a cross-source duplication matrix, and
winnowing document fingerprints (the MOSS/plagiarism-detection scheme,
the shift-robust cousin of the fixed-stride chunk dedup in
curation.py:text_chunk_dedup). The reference engine (294 LoC of Rust
delegating to SQLite, reference src/main.rs) has none of this surface;
these extend the Tier-C mission set.

Determinism contract (SURVEY §4.3): every derived key is integer-exact —
md5 hex is byte-identical on Spark and DuckDB, the first 8 hex chars
parse to the same 32-bit integer (Spark `conv(...,16,10)`, DuckDB
`('0x'||...)::UBIGINT`), and all downstream arithmetic stays in BIGINT.
No floats anywhere, so no rounding contract is needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from .relational import T


def _h32(col):
    """First 32 bits of md5(col) as a non-negative BIGINT — the
    engine-portable uniform hash this module keys everything on (same
    construction as queries/quality.py:sketch_count_min)."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
            .cast("bigint"))


# --------------------------------------------- leakage-free corpus split

@query("pipeline_train_val_split", oracle="""
    WITH h AS (
        SELECT lang, n_chars,
               CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                    1, 8))::UBIGINT AS BIGINT) % 100 AS b
        FROM documents
    )
    SELECT CASE WHEN b < 90 THEN 'train'
                WHEN b < 95 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM h GROUP BY 1
""")
def pipeline_train_val_split(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test split by hashed document id:
    bucket = md5('split:' || doc_id) mod 100 — every worker (and every
    engine) assigns the same document to the same split with no stored
    assignment table, no RNG state, and no coordination; re-runs and
    incremental corpus additions never move an existing document across
    the split boundary (the property that keeps eval sets uncontaminated
    as the corpus grows). Output is the per-split census a data card
    needs: document count, byte budget, language coverage.

    Scale shape: one map-side-combinable aggregation over a projected
    scan (doc_id, lang, n_chars — the text column is pruned); the only
    shuffle is 3 groups wide. Salting is unnecessary: md5 buckets are
    uniform by construction."""
    d = T(spark, sf_dir, "documents")
    b = F.pmod(_h32(F.concat(F.lit("split:"),
                             F.col("doc_id").cast("string"))), F.lit(100))
    split = (F.when(b < 90, "train").when(b < 95, "val")
             .otherwise("test"))
    return (d.select(split.alias("split"), "lang", "n_chars")
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars"),
                 F.countDistinct("lang").alias("n_langs")))


# ------------------------------------------ cross-source duplication map

@query("dedup_source_matrix", oracle="""
    WITH s AS (
        SELECT DISTINCT
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS sig,
               source
        FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM s a JOIN s b ON a.sig = b.sig AND a.source < b.source
    GROUP BY 1, 2
""")
def dedup_source_matrix(spark, sf_dir):
    """Cross-source duplication matrix: for every pair of corpus
    sources, how many distinct documents (keyed by the sorted-word-set
    fingerprint, the same signature pipeline_training_data dedups on)
    appear in BOTH — the diagnostic that tells a curation team which
    crawls/mirrors overlap before they pick a precedence order. Source
    pairs are canonicalized src_a < src_b so each overlap counts once.

    Scale shape: the signature collapses each document to one md5
    string executor-side (text never shuffles); DISTINCT (sig, source)
    is one hash shuffle on the signature; the self-join is an equi-join
    on sig whose per-key fan-out is bounded by the source count (7
    here), so the output is at most C(n_sources, 2) rows — no
    quadratic blow-up even when one document appears in every
    source."""
    d = T(spark, sf_dir, "documents")
    sig = F.md5(F.array_join(F.array_sort(F.array_distinct(
        F.split(F.col("text"), " "))), " "))
    s = d.select(sig.alias("sig"), "source").distinct()
    a, b = s.alias("a"), s.alias("b")
    return (a.join(b, (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.source") < F.col("b.source")))
            .groupBy(F.col("a.source").alias("src_a"),
                     F.col("b.source").alias("src_b"))
            .agg(F.count("*").alias("n_shared")))


# ---------------------------------------------- winnowing fingerprints

@query("text_winnowing", oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    g AS (
        SELECT doc_id,
               [CAST(('0x' || substr(md5(array_to_string(
                        words[i : i + 4], ' ')), 1, 8))::UBIGINT AS BIGINT)
                for i in range(1, len(words) - 3)] AS hs
        FROM w WHERE len(words) >= 5
    ),
    m AS (
        SELECT doc_id,
               list_distinct([list_min(hs[j : j + 3])
                              for j in range(1, len(hs) - 2)]) AS fps
        FROM g WHERE len(hs) >= 4
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS fp_min,
           CAST(list_sum(fps) AS BIGINT) AS fp_sum
    FROM m
""")
def text_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): hash every 5-word shingle, slide a window of 4 consecutive
    shingle hashes, keep each window's minimum, and the distinct minima
    are the document's fingerprints. Winnowing guarantees every shared
    run of >= 8 words between two documents shares at least one
    fingerprint — position-robust where text_chunk_dedup's fixed-stride
    chunks break on a one-word insertion. Emitted as the per-doc
    fingerprint census (count / min / sum, all exact integers); the
    fingerprint-join dedup reuses the inverted-index machinery of
    dedup_containment.

    Scale shape: pure per-row higher-order-function arithmetic inside
    whole-stage codegen — zero shuffles, zero Python; cost is linear in
    corpus bytes and embarrassingly parallel. The window minimum is
    O(w) per position here (w=4); the production O(1) monotone-deque
    form is a mapInPandas drop-in with the same output contract."""
    d = T(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = d.select("doc_id", words.alias("words")).filter(
        F.size("words") >= 5)
    # shingle hashes: h(i) = first 32 md5 bits of words[i..i+4] joined
    hs = F.expr(
        "transform(sequence(1, size(words) - 4), i -> "
        "cast(conv(substring(md5(array_join(slice(words, i, 5), ' ')), "
        "1, 8), 16, 10) as bigint))")
    g = base.select("doc_id", hs.alias("hs")).filter(F.size("hs") >= 4)
    mins = F.expr(
        "array_distinct(transform(sequence(1, size(hs) - 3), j -> "
        "array_min(slice(hs, j, 4))))")
    m = g.select("doc_id", mins.alias("fps"))
    return m.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fp"),
        F.array_min("fps").cast("bigint").alias("fp_min"),
        F.expr("aggregate(fps, 0L, (acc, x) -> acc + x)").alias("fp_sum"))


# --------------------------------------- content-defined chunking dedup

@query("text_cdc_chunks", oracle="""
    WITH w AS (
        SELECT doc_id, source, string_split(text, ' ') AS words
        FROM documents
    ),
    e AS (
        SELECT doc_id, source, words,
               [0] || [i for i in range(1, len(words))
                       if CAST(('0x' || substr(md5(words[i]), 1, 8))
                               ::UBIGINT AS BIGINT) % 8 = 0]
                   || [len(words)] AS edges
        FROM w
    ),
    ch AS (
        SELECT doc_id, source,
               unnest([array_to_string(words[edges[j] + 1 : edges[j + 1]],
                                       ' ')
                       for j in range(1, len(edges))]) AS chunk
        FROM e
    ),
    sig AS (
        SELECT source, md5(chunk) AS sig,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(len(string_split(min(chunk), ' ')) AS BIGINT) AS wlen
        FROM ch GROUP BY source, md5(chunk)
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(cnt - 1) AS BIGINT) AS n_dup,
           CAST(sum((cnt - 1) * wlen) AS BIGINT) AS words_savable
    FROM sig GROUP BY source
""")
def text_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup census: chunk boundaries fall
    AFTER any word whose 32-bit md5 is 0 mod 8 (expected chunk ~8
    words), so boundaries depend only on local content — insert one
    word at the top of a page and every chunk after it still aligns,
    where fixed-stride chunking (text_chunk_dedup's 5-word grid) shifts
    every downstream chunk. This is the rsync/LBFS/data-deduplication
    trick applied to corpus text; the census reports, per source, how
    many chunk occurrences are redundant and how many words chunk-level
    dedup would reclaim.

    Scale shape: boundary detection and chunk splitting are per-row
    HOF arithmetic (zero shuffles, linear in corpus bytes); only chunk
    FINGERPRINTS shuffle — one hash aggregation keyed (source, sig),
    map-side combinable, then a source-sized rollup. The chunk text
    itself never crosses the wire (md5 computed executor-side)."""
    d = T(spark, sf_dir, "documents")
    w = d.select("doc_id", "source",
                 F.split(F.col("text"), " ").alias("words"))
    edges = F.expr(
        "concat(array(0), filter(sequence(1, size(words) - 1), i -> "
        "cast(conv(substring(md5(element_at(words, i)), 1, 8), 16, 10) "
        "as bigint) % 8 = 0), array(size(words)))")
    e = w.select("doc_id", "source", "words", edges.alias("edges"))
    chunks = F.expr(
        "transform(sequence(1, size(edges) - 1), j -> "
        "array_join(slice(words, element_at(edges, j) + 1, "
        "element_at(edges, j + 1) - element_at(edges, j)), ' '))")
    ch = (e.select("source", F.explode(chunks).alias("chunk")))
    sig = (ch.groupBy("source", F.md5("chunk").alias("sig"))
           .agg(F.count("*").alias("cnt"),
                F.size(F.split(F.min("chunk"), " ")).cast("bigint")
                .alias("wlen")))
    return (sig.groupBy("source")
            .agg(F.sum("cnt").alias("n_chunks"),
                 F.count("*").alias("n_distinct"),
                 F.sum(F.col("cnt") - 1).alias("n_dup"),
                 F.sum((F.col("cnt") - 1) * F.col("wlen"))
                 .alias("words_savable")))
