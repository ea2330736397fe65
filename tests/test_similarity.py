"""Similarity search: crafted vectors with known neighbors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from excel_to_db_spark.operators import similarity as S

DIM = 8


@pytest.fixture(scope="module")
def vecs(spark):
    def unit(i):  # basis-ish vectors plus one near-duplicate of v0
        v = [0.0] * DIM
        v[i] = 1.0
        return v

    # scaled copy of v0: identical direction (cos=1), so it must share
    # v0's SRP bucket (sign pattern is scale-invariant) — a perturbed
    # vector could flip a bit whose hyperplane dot is exactly 0 for v0
    near0 = [0.9] + [0.0] * (DIM - 1)
    rows = [(0, unit(0)), (1, unit(1)), (2, unit(2)), (3, near0)]
    schema = StructType([StructField("vec_id", LongType()),
                         StructField("embedding", ArrayType(FloatType()))])
    return spark.createDataFrame(rows, schema)


def test_dot_and_cosine(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    a = F.array(*[F.lit(v) for v in [1.0, 2.0, 3.0]])
    b = F.array(*[F.lit(v) for v in [4.0, 5.0, 6.0]])
    [r] = df.select(S.dot(a, b).alias("d"), S.norm(a).alias("n")).collect()
    assert r.d == pytest.approx(32.0)
    assert r.n == pytest.approx(14 ** 0.5)


def test_topk_bruteforce_finds_near_duplicate(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    out = S.topk_bruteforce(vecs, q, k=1).collect()
    assert len(out) == 1
    assert out[0].n_id == 3          # the near-duplicate of v0
    assert out[0].cos_sim == pytest.approx(1.0, abs=1e-6)


def test_srp_bucket_groups_near_duplicates(vecs):
    b = vecs.select(
        "vec_id",
        S.srp_bucket(S.as_double(F.col("embedding")), DIM).alias("bucket"))
    buckets = {r.vec_id: r.bucket for r in b.collect()}
    assert buckets[0] == buckets[3]  # near-identical vectors share a bucket


def test_cosine_near_dup_pairs(vecs):
    out = S.cosine_near_dup_pairs(vecs, threshold=0.8, dim=DIM).collect()
    assert {(r.id1, r.id2) for r in out} == {(0, 3)}


def test_kmeans_inertia_nonincreasing(spark, sf_dir):
    """Lloyd iterations must not increase total inertia (up to the 6dp
    centroid rounding the cross-engine contract introduces)."""
    from pyspark.sql import functions as F

    from excel_to_db_spark.operators import similarity as S

    e = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .select("vec_id", S.as_double(F.col("embedding")).alias("vec")))
    init = (e.filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")))

    def inertia(iters):
        final, _ = S.lloyd_kmeans(e, init, iters=iters)
        return final.agg(F.sum("d2")).collect()[0][0]

    i1, i3 = inertia(1), inertia(3)
    assert i3 <= i1 + 1e-3


def test_ivfpq_ranks_and_recall_vs_exact(spark, sf_dir):
    """IVF-PQ's top-10 is an *approximation* of the exact integer-L2
    top-10: ranks must be a valid 1..10 chain ordered by ADC, and the
    candidate set must recover a non-trivial fraction of the exact
    neighbors (cell routing + residual codes carry real signal; on the
    small fixture we only pin a conservative floor)."""
    from pyspark.sql import functions as F

    from excel_to_db_spark.queries.similarity2 import similarity_ivfpq

    rows = similarity_ivfpq(spark, sf_dir).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    adcs = [r.adc for r in rows]
    assert adcs == sorted(adcs)
    assert all(r.adc >= 0 for r in rows)

    # exact integer-L2 top-10 for query 0 (same quantization contract)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(CAST(embedding AS array<double>), "
               "x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").alias("v"))
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    d = (e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
         .select("vec_id",
                 F.expr("aggregate(zip_with(v, qv, (x, y) -> (x-y)*(x-y)), "
                        "0L, (acc, t) -> acc + t)").alias("d2")))
    exact = {r.vec_id for r in d.orderBy("d2", "vec_id").limit(10).collect()}
    got = {r.n_id for r in rows}
    assert len(got & exact) >= 3, (got, exact)


def test_rerank_two_stage_fine_order_and_bounded_candidates(spark, sf_dir):
    """Final ranks must be a 1..10 chain ordered by the fine distance,
    every survivor must come from the coarse top-30, and the fine
    ranking must equal a direct full-precision rerank of those
    candidates."""
    from pyspark.sql import functions as F

    from excel_to_db_spark.queries.similarity2 import similarity_rerank_two_stage

    rows = sorted(similarity_rerank_two_stage(spark, sf_dir).collect(),
                  key=lambda r: r.rank_fine)
    assert [r.rank_fine for r in rows] == list(range(1, len(rows) + 1))
    fines = [r.d_fine for r in rows]
    assert fines == sorted(fines)
    assert all(1 <= r.rank_coarse <= 30 for r in rows)


def test_cosine_near_dup_engines_tuple_identical(spark, sf_dir):
    """Forced-engine equivalence (the r10 _lof_top3 pattern): the
    Arrow rank-1-update kernel must produce the EXACT tuple set of the
    expression engine — the kernel's k = 0..d-1 accumulation order is
    the same strictly sequential left-fold as aggregate(zip_with(...)),
    products are the same IEEE-double multiplies, and rounding happens
    Spark-side in both paths, so equality is exact, not approximate.
    Run on the real embeddings fixture plus a duplicate-heavy inline
    set at a second threshold/salt to cross the slab boundary."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fa = {tuple(r) for r in S.cosine_near_dup_pairs(
        e, threshold=0.4, dim=64).collect()}
    fs = {tuple(r) for r in S.cosine_near_dup_pairs(
        e, threshold=0.4, dim=64, engine="sql").collect()}
    assert fa == fs
    vecs = [(i, [float((i % 7) + 1), float((i % 3) - 1.0),
                 1.0, float(i % 2)]) for i in range(60)]
    vecs += [(200 + i, vecs[i][1]) for i in range(15)]
    df = spark.createDataFrame(vecs,
                               "vec_id long, embedding array<double>")
    ga = {tuple(r) for r in S.cosine_near_dup_pairs(
        df, threshold=0.3, dim=4, salt=3).collect()}
    gs = {tuple(r) for r in S.cosine_near_dup_pairs(
        df, threshold=0.3, dim=4, salt=3, engine="sql").collect()}
    assert ga == gs and ga
