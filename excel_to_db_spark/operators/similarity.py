"""Vector similarity search over an embedding column (array<float>).

The reference has no vector surface at all (its SQL passthrough at
reference src/main.rs:220 reaches SQLite, which has none either); this is
the Tier C extension family (SURVEY.md §2.C): brute-force cosine top-k as
the correctness baseline, and an SRP-LSH (signed-random-projection)
bucketed variant as the approximate scale path.

Everything is built from higher-order array functions (`zip_with`,
`aggregate`, `transform`) — JVM-side, codegen'd, no Python in the hot
loop — and the only joins are (a) a broadcast of the small query set or
(b) an equi-join on the LSH bucket id.

Scale notes (100 TB of vectors):

- Brute force is O(|Q|·|C|·d) but shuffle-free when Q broadcasts: the
  corpus streams through executors once, each computing local top-k
  (TakeOrderedAndProject after the window trick would global-sort; the
  groupBy-rank form keeps per-query heaps distributed).
- SRP-LSH turns that into one equi-join on bucket id: candidates are only
  vectors whose sign pattern agrees, cost O(collisions). The hyperplanes
  are small-integer patterns (exact in IEEE double), so results are
  bit-reproducible across engines — the DuckDB oracle runs the identical
  math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Deterministic "random" hyperplanes: h_j[i] = ((i*31 + j*17) % 7) - 3.
# Small integers => every dot product is exact integer-scaled arithmetic
# in double; sign() is then unambiguous and engine-independent.
N_PLANES = 4


def _plane(j: int, dim: int) -> list[int]:
    return [((i * 31 + j * 17) % 7) - 3 for i in range(dim)]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns via zip_with + aggregate
    (sequential left-fold => deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    """array<float> -> array<double> so both engines do double math on
    identically-rounded inputs (float32 values widen exactly)."""
    return a.cast("array<double>")


def topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus,
    rank per query. Returns (q_id, n_id, cos_sim, rk).

    The corpus side never shuffles until the final per-query rank, whose
    input is already reduced to |Q|·|C| scored pairs; at scale, pre-reduce
    with a per-partition top-k (see `topk_bruteforce_partitioned`).

    The corpus probe side is fan_out-gated (r9 skew audit: on a narrow
    local scan the whole |Q|x|C| cosine compute inherited 1-2 parquet
    splits — similarity_topk ran 81 s with no stage over 3 tasks; a
    wide cluster scan leaves the gate a no-op)."""
    from .skew import fan_out

    q = queries.select(F.col(id_col).alias("q_id"),
                       as_double(F.col(vec_col)).alias("q_vec"))
    c = fan_out(corpus).select(F.col(id_col).alias("n_id"),
                               as_double(F.col(vec_col)).alias("n_vec"))
    scored = (c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= k)
            .select("q_id", "n_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"))


def srp_bucket(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Signed-random-projection bucket id: bit j = [dot(v, h_j) > 0]."""
    bucket = F.lit(0)
    for j in range(n_planes):
        h = F.array(*[F.lit(float(w)) for w in _plane(j, dim)])
        bucket = bucket + F.when(dot(vec, h) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def topk_srp_lsh(corpus: DataFrame, queries: DataFrame, k: int, dim: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors in the query's SRP
    bucket only; exact cosine rank within the bucket. One equi-join on
    the bucket id instead of a cross product — the 100 TB path."""
    q = queries.select(F.col(id_col).alias("q_id"),
                       as_double(F.col(vec_col)).alias("q_vec"))
    q = q.withColumn("bucket", srp_bucket(F.col("q_vec"), dim))
    c = corpus.select(F.col(id_col).alias("n_id"),
                      as_double(F.col(vec_col)).alias("n_vec"))
    c = c.withColumn("bucket", srp_bucket(F.col("n_vec"), dim))
    scored = (c.join(F.broadcast(q), on="bucket")
              .filter(F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= k)
            .select("q_id", "n_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"))


def cosine_near_dup_pairs(vectors: DataFrame, threshold: float, dim: int,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          salt: int = 48, engine: str = "arrow") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cos >= threshold)
    via SRP blocking: a pair this similar almost surely lands in the same
    bucket (and the oracle uses the same blocking, so the contract is the
    algorithm, not an all-pairs scan).

    The within-bucket self-join is SALTED: the left side keys on
    (bucket, vid mod salt), the right side replicates each row across
    all salt values — every pair still produced exactly once, but a hot
    bucket's pair mass spreads over `salt` tasks instead of one.
    Without it the round-7 sf1 sweep measured a single straggler task
    computing the hottest bucket's 5.2M cosines for 645s while 31 cores
    idled — AQE's skew split never fires here because its thresholds
    are shuffle BYTES, and a compute-heavy byte-light stage (tiny
    vectors in, quadratic pair work after) looks balanced to it.

    The join inputs use EXPLICIT-N repartition on (bucket, sk), not the
    planner's ensure-requirements exchange: AQE's partition COALESCING
    is the mirror image of the skew blind spot — it merges post-shuffle
    partitions by BYTES, and a few hundred MB of vectors carrying tens
    of millions of pair-cosines coalesces to 2-3 tasks, silently
    un-doing the salting (measured in the r8 skew audit: the salted
    join ran as a <=3-task stage, 322 s wall, ~1.5/32 cores busy). AQE
    never coalesces a user-specified numbered repartition, so the
    cosine stage keeps its full task fan-out.

    Per-VECTOR norms are hoisted out of the pair loop (r11): Spark's
    higher-order array functions are interpreted per element, not
    whole-stage-codegen'd, so the inline cosine's three 64-element
    folds per pair (dot + both norms) cost ~30us/pair; carrying
    norm(vec) through the join leaves one fold per pair.
    BIT-identical: norm(a) is the same sequential left-fold over the
    same array wherever it is evaluated, and the final expression
    dot/(na*nb) is unchanged.

    engine="arrow" (default, r11) moves the per-pair dot into a
    cogrouped-applyInPandas kernel: even hoisted, the expression path
    pays ~20 us/pair because `aggregate(zip_with(...))` is INTERPRETED
    per element (higher-order lambdas never enter whole-stage
    codegen), and 17.7M within-bucket pairs at jittered sf1 made that
    the entire wall. The kernel reproduces the EXACT left-fold sum —
    products are elementwise IEEE-double multiplies and
    np.add.accumulate is defined as the strictly sequential
    application of + (unlike np.dot/np.add.reduce, whose pairwise
    blocking sums in a different order) — then evaluates the same
    dot/(na*nb) and HALF_UP rounding Spark-side is unchanged, so the
    two engines are property-tested TUPLE-IDENTICAL
    (tests/test_similarity_ops.py). Slabs bound the (probe x cand x
    dim) product tensor exactly like the knn-density kernel. With the
    hot-bucket mass at jittered sf1 (two SRP buckets hold ~16% of
    vectors each), salt=48 levels what salt=16 left 2.6x skewed;
    together 37.5 -> ~6s."""
    n_parts = int(vectors.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    v = vectors.select(F.col(id_col).alias("vid"),
                       as_double(F.col(vec_col)).alias("vec"))
    v = (v.withColumn("bucket", srp_bucket(F.col("vec"), dim))
         .withColumn("nrm", norm(F.col("vec"))))
    # sk on BOTH sides is an explicit int: a's pmod(bigint vid) would
    # otherwise be bigint while b's explode(sequence(0, ...)) is int —
    # a join would auto-coerce, but the cogroup path groups each side
    # independently and mismatched key types silently split every
    # group into a left-only and a right-only half (the knn-density
    # cogroup trap).
    a = v.select(F.col("vid").alias("id1"), F.col("vec").alias("va"),
                 F.col("nrm").alias("na"), "bucket",
                 F.pmod(F.col("vid"), F.lit(salt)).cast("int").alias("sk"))
    a = a.repartition(n_parts, "bucket", "sk")
    b = (v.select(F.col("vid").alias("id2"), F.col("vec").alias("vb"),
                  F.col("nrm").alias("nb"), "bucket")
         .withColumn("sk", F.explode(F.sequence(F.lit(0),
                                                F.lit(salt - 1)))))
    b = b.repartition(n_parts, "bucket", "sk")
    if engine != "arrow":
        cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (a.join(b, ["bucket", "sk"])
                .where(F.col("id1") < F.col("id2"))
                .select("id1", "id2", cos.alias("cos_sim"))
                .filter(F.col("cos_sim") >= threshold)
                .select("id1", "id2",
                        F.round("cos_sim", 6).alias("cos_sim")))

    import numpy as np
    import pandas as pd

    cells = 8_000_000  # product-tensor doubles per slab (~64 MB)
    thr = float(threshold)

    def _pairs_block(left: pd.DataFrame, right: pd.DataFrame
                     ) -> pd.DataFrame:
        empty = pd.DataFrame({"id1": pd.Series([], dtype="int64"),
                              "id2": pd.Series([], dtype="int64"),
                              "cos_sim": pd.Series([], dtype="float64")})
        if len(left) == 0 or len(right) == 0:
            return empty
        A = np.stack(left["va"].to_numpy()).astype(np.float64)
        B = np.stack(right["vb"].to_numpy()).astype(np.float64)
        na = left["na"].to_numpy().astype(np.float64)
        nb = right["nb"].to_numpy().astype(np.float64)
        i1 = left["id1"].to_numpy()
        i2 = right["id2"].to_numpy()
        d = A.shape[1]
        # Slab so the (step x n_cand) accumulator stays cache-sized
        # (~4 MB): the exact left-fold needs d sequential passes over
        # it, so a DRAM-sized accumulator would turn the kernel
        # memory-bound (measured: the full product-tensor +
        # np.add.accumulate formulation moved ~36 GB and ran no
        # faster than the expression path).
        step = max(1, min(cells // max(1, len(B) * d),
                          (512 * 1024) // max(1, len(B))))
        outs = []
        for s in range(0, len(A), step):
            As, i1s, nas = A[s:s + step], i1[s:s + step], na[s:s + step]
            # exact left-fold dot as d rank-1 updates: per pair the
            # products accumulate in index order k = 0..d-1, the same
            # strictly sequential + application as the SQL engine's
            # aggregate(zip_with(...)) fold (acc starts at 0.0 there;
            # 0.0 + p0 == p0 exactly, so the zeros init is identical).
            acc = np.zeros((len(As), len(B)))
            tmp = np.empty_like(acc)
            for k in range(d):
                np.multiply(As[:, k:k + 1], B[None, :, k], out=tmp)
                acc += tmp
            cos = acc / (nas[:, None] * nb[None, :])
            keep = (i1s[:, None] < i2[None, :]) & (cos >= thr)
            ii, jj = np.nonzero(keep)
            if len(ii):
                outs.append(pd.DataFrame({"id1": i1s[ii], "id2": i2[jj],
                                          "cos_sim": cos[ii, jj]}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    pairs = (a.groupBy("bucket", "sk")
             .cogroup(b.withColumnRenamed("bucket", "b_bucket")
                      .withColumnRenamed("sk", "b_sk")
                      .groupBy("b_bucket", "b_sk"))
             .applyInPandas(_pairs_block,
                            "id1 long, id2 long, cos_sim double"))
    return pairs.select("id1", "id2",
                        F.round("cos_sim", 6).alias("cos_sim"))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared euclidean distance via zip_with + sequential fold."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def ivf_assign(vectors: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str = "vec", nprobe: int = 1) -> DataFrame:
    """IVF coarse quantization: assign each vector to its `nprobe`
    nearest centroids (min squared distance, centroid id ascending
    tie-break). Corpus vectors use nprobe=1 (each lives in ONE cell);
    queries use nprobe>1 to probe several cells — the standard
    recall-vs-cost knob (measured here: nprobe 1 -> 2 roughly doubles
    recall@10). centroids is small -> broadcast cross join + per-row
    rank. At 100 TB the assignment is one broadcast pass, and the corpus
    is written partitioned BY cell so probes touch nprobe partitions."""
    c = centroids.select(F.col("cid"), F.col("cvec"))
    scored = (vectors.crossJoin(F.broadcast(c))
              .withColumn("d2", sq_dist(F.col(vec_col), F.col("cvec"))))
    w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("cid").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= nprobe)
            .drop("rk", "d2", "cvec")
            .withColumnRenamed("cid", "cell"))


def lloyd_kmeans(vectors: DataFrame, init_centroids: DataFrame,
                 iters: int = 2, id_col: str = "vec_id",
                 vec_col: str = "vec") -> tuple[DataFrame, DataFrame]:
    """Unrolled Lloyd's k-means: `iters` rounds of (assign to nearest
    centroid -> recompute element-wise means), returning the final
    (assignment, centroids). The IVF training step made a first-class
    iterative operator.

    Determinism across engines (the oracle contract): centroid means
    are ROUNDED to 6 dp each round, so the next round's distances are
    computed from bit-identical centroids in Spark and DuckDB — an
    ulp-level difference in summation order can never flip an argmin.
    Ties break by centroid id (ivf_assign).

    Scale shape per round: one broadcast cross join (k centroids) +
    per-row rank for assignment, one posexplode shuffle keyed on
    (cluster, dim) for the mean — state is k x dim regardless of corpus
    size, and the loop is driver-side orchestration over distributed
    rounds, exactly like dedup's label propagation."""
    cents = init_centroids.select("cid", "cvec")
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col)
        cents = (assigned
                 .select(F.col("cell").alias("cid"),
                         F.posexplode(F.col(vec_col)).alias("pos", "v"))
                 .groupBy("cid", "pos")
                 .agg(F.round(F.avg("v"), 6).alias("m"))
                 .groupBy("cid")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "m"))),
                     lambda s: s["m"]).alias("cvec")))
    final = (ivf_assign(vectors, cents, id_col, vec_col)
             .join(F.broadcast(cents.withColumnRenamed("cid", "cell")), "cell")
             .withColumn("d2", sq_dist(F.col(vec_col), F.col("cvec")))
             .drop("cvec"))
    return final, cents


def topk_ivf(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int, id_col: str = "vec_id", vec_col: str = "embedding",
             nprobe: int = 2) -> DataFrame:
    """IVF search: score only corpus vectors in the query's `nprobe`
    nearest cells. Complements SRP-LSH as the second ANN scale path
    (SURVEY.md §2.C): the candidate join is an equi-join on `cell`.
    With a deterministic coarse quantizer (fixed centroid list) the whole
    algorithm is engine-independent, so the DuckDB oracle runs it too."""
    cvecs = centroids.select("cid", F.col("cvec").cast("array<double>").alias("cvec"))
    q = queries.select(F.col(id_col).alias("q_id"),
                       as_double(F.col(vec_col)).alias("q_vec"))
    q = ivf_assign(q, cvecs, "q_id", "q_vec", nprobe)
    c = corpus.select(F.col(id_col).alias("n_id"),
                      as_double(F.col(vec_col)).alias("n_vec"))
    c = ivf_assign(c, cvecs, "n_id", "n_vec")
    scored = (c.join(F.broadcast(q), on="cell")
              .filter(F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      cosine(F.col("q_vec"), F.col("n_vec")).alias("cos_sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(),
                                           F.col("n_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rk") <= k)
            .select("q_id", "n_id", F.round("cos_sim", 6).alias("cos_sim"), "rk"))


def gramian_int(vectors: DataFrame, vec_col: str = "embedding",
                dim: int = 64, scale: float = 1e6) -> DataFrame:
    """Exact integer Gramian X^T X of an embedding column: components
    fixed-pointed to integer `scale`ths (floor(v*scale + 0.5), the
    repo-wide cross-engine rounding rule — see map_in_arrow), then the
    d x d outer-product sum accumulates in int64. One mapInArrow pass
    emits a single d^2-row partial per partition; one tiny (i, j)
    shuffle merges them. Driver never sees row data — only the d^2
    state (4096 longs for d=64), the same orchestration budget as
    lloyd_kmeans. Exact: int64 products (|v*scale| ~ 1e6 -> products
    1e12, per-partition sums < 2^63), so every engine/order agrees
    bit-for-bit."""
    import pyarrow as pa

    def gram(batches):
        import numpy as np

        acc = np.zeros((dim, dim), dtype=np.int64)
        for batch in batches:
            col = batch.column(batch.schema.names.index(vec_col))
            flat = np.asarray(col.values.to_numpy(zero_copy_only=False),
                              dtype=np.float64)
            if flat.size == 0:
                continue
            q = np.floor(flat * scale + 0.5).astype(np.int64)
            m = q.reshape(-1, dim)
            acc += m.T @ m
        i, j = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        yield pa.record_batch([pa.array(i.ravel(), pa.int32()),
                               pa.array(j.ravel(), pa.int32()),
                               pa.array(acc.ravel(), pa.int64())],
                              names=["i", "j", "g"])

    parts = vectors.select(vec_col).mapInArrow(gram, "i int, j int, g long")
    return parts.groupBy("i", "j").agg(F.sum("g").alias("g"))


def _tdiv_scaled(x: int, m: int) -> int:
    """(x * 1e6) / m truncated toward zero, in exact Python ints — the
    renormalization step of the fixed-point matrix squaring, written so
    a SQL CASE WHEN p < 0 THEN -((-p*1e6)//m) ELSE (p*1e6)//m END
    reproduces it bit-for-bit (Python // floors, so route through abs)."""
    return -((-x * 1_000_000) // m) if x < 0 else (x * 1_000_000) // m


def pca_power_squared(vectors: DataFrame, vec_col: str = "embedding",
                      dim: int = 64, squarings: int = 11) -> DataFrame:
    """First principal direction via REPEATED SQUARING of the exact
    integer Gramian: M <- truncate(M@M * 1e6 / max|M@M|), k times, so
    the effective power-iteration depth is 2^k (2048 at k=11) — enough
    to converge through this corpus's 0.984 eigengap (0.984^2048 ~
    4e-15), where a stepwise SQL-replayable recursion is capped at tens
    of steps. Every squaring is EXACT integer arithmetic (entries
    <= 1e6, products <= 64e12 < 2^63; the rescale runs through Python
    ints / HUGEINT), so a DuckDB oracle of k chained CTEs reproduces
    the iterate bit-for-bit; the only floats are the final per-entry
    normalization and the Rayleigh-quotient division of two exact
    integers. Accuracy vs the true eigenvector is bounded by the 1e-6
    per-squaring truncation (~1e-5 on loadings), not by eigengap decay.

    G is PSD, so G^(2^k) -> lambda1^(2^k) v1 v1^T: the dominant
    eigenvector is read off the column with the largest diagonal.
    Cluster work stays ONE mapInArrow Gramian pass; the squarings are
    64x64 driver-side integer matmuls (microseconds)."""
    rows = gramian_int(vectors, vec_col, dim).collect()
    G = [[0] * dim for _ in range(dim)]
    for r in rows:
        G[r["i"]][r["j"]] = int(r["g"])
    m0 = max(abs(x) for row in G for x in row)
    M = [[_tdiv_scaled(x, m0) for x in row] for row in G]
    for _ in range(squarings):
        P = [[sum(M[i][t] * M[t][j] for t in range(dim))
              for j in range(dim)] for i in range(dim)]
        mx = max(abs(x) for row in P for x in row)
        M = [[_tdiv_scaled(x, mx) for x in row] for row in P]
    # dominant column: largest diagonal entry, smallest index on ties
    jstar = max(range(dim), key=lambda j: (M[j][j], -j))
    v = [M[i][jstar] for i in range(dim)]
    k = max(range(dim), key=lambda d: (abs(v[d]), -d))
    sgn = -1 if v[k] < 0 else 1
    n2 = sum(x * x for x in v)                       # exact int
    num = sum(G[i][j] * v[i] * v[j]                  # exact int (PSD)
              for i in range(dim) for j in range(dim))
    tr = sum(G[i][i] for i in range(dim))
    import math
    nrm = math.sqrt(float(n2))
    share = round(float(num) / (float(n2) * float(tr)), 6)
    spark = vectors.sparkSession
    data = [(d, round(sgn * v[d] / nrm, 6), share) for d in range(dim)]
    return spark.createDataFrame(data, "dim int, loading double, "
                                       "eigval_share double")


def pca_power(vectors: DataFrame, vec_col: str = "embedding",
              dim: int = 64, iters: int = 2000,
              fixed_iters: int | None = None) -> DataFrame:
    """First principal direction of the (uncentered) embedding cloud by
    power iteration on the exact integer Gramian — distributed PCA in
    the lloyd_kmeans mold: the cluster computes the d^2 sufficient
    statistic in one pass; the driver iterates only on that tiny
    state (64x64 matvecs), never on data. Uncentered PCA is the
    norm for embedding spaces (direction of maximal second moment);
    centering would subtract the broadcastable mean vector first —
    same shape, one more tiny aggregate.

    Determinism: the Gramian is exact int64, its float64 image is a
    deterministic conversion, and numpy's fixed-iteration matvec is
    bit-stable, so loadings are engine-independent; the sign is
    canonicalized (largest-|loading| component positive). Returns
    (dim, loading, eigval_share) with loadings rounded to 6 dp."""
    import numpy as np

    rows = gramian_int(vectors, vec_col, dim).collect()
    G = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        G[r["i"], r["j"]] = float(r["g"])
    v = np.ones(dim) / np.sqrt(dim)
    if fixed_iters is not None:
        # Fixed-STEP mode (cross-engine contract): exactly fixed_iters
        # normalized matvecs, no convergence break. The k-step iterate
        # is a well-defined engine-independent statistic even when the
        # eigengap is too tight for full convergence (the sf testdata's
        # synthetic embeddings have lambda2/lambda1 = 0.984, needing
        # ~1800 steps to 1e-13) — arithmetic-order noise between numpy
        # and a SQL recursion is damped by the normalization and stays
        # ~1e-13 after 64 steps, far inside the 6-dp rounding.
        for _ in range(fixed_iters):
            w = G @ v
            v = w / np.linalg.norm(w)
    else:
        for _ in range(iters):
            w = G @ v
            w = w / np.linalg.norm(w)
            # Fixed-point check: convergence rate is (lambda2/lambda1)^k,
            # so a tight eigengap needs hundreds of 64x64 matvecs — still
            # microseconds of driver time, bit-deterministic.
            if np.max(np.abs(w - v)) < 1e-13:
                v = w
                break
            v = w
    lam = float(v @ (G @ v))
    share = lam / float(np.trace(G))
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    spark = vectors.sparkSession
    data = [(d, round(float(v[d]), 6), round(share, 6))
            for d in range(dim)]
    return spark.createDataFrame(data, "dim int, loading double, "
                                       "eigval_share double")
