"""Similarity search over embedding columns (array<float>).

Determinism strategy: quantize each coordinate to an integer
(round(x * 1e6)) so dot products and norms are EXACT int64 sums --
order-independent, overflow-safe for dims <= ~4k at unit scale -- and
only the final cosine division happens in floating point (both engines
then produce the identical IEEE double from identical integers).

Scale design:

- **brute_force_topk**: small query set vs corpus. One corpus scan,
  zero corpus shuffles: the query matrix rides a mapInPandas closure.
- **lsh_bucket_topk / ivf_topk**: bucket/cell the corpus; candidates
  shuffle on the bucket/cell key only (the 100 TB path), with
  deterministic caps on hot groups. Recall depends on granularity --
  the standard IVF/LSH-probe tradeoff, brute force the exact baseline.

Compute strategy (r6): candidate *generation* (quantize, bucket keys,
codebook argmax input prep) stays in built-in expressions; candidate
*scoring* runs in vectorized Arrow kernels (one int64 numpy gram
matmul per group/batch). Catalyst interprets higher-order functions
per element (~12us per 64-dim pair -- measured), so per-pair HOF dots
made every pair join superlinear in wall-clock; the kernels are
bit-identical (exact int64 dots, IEEE float64 divide in the same
operation order, same tie-breaks) and BLAS-fast. No row-at-a-time
Python UDFs anywhere.
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
    # qnorm reads the BOUND qvec column, not the raw quantize
    # expression: int_dot(q, q) inlined the transform twice more (once
    # per zip_with side), tripling the per-row quantize work -- and
    # when vec_col itself is an unbound assembly (the hashed-embedding
    # chain) the whole upstream re-ran with it. Measured 0.52s ->
    # 0.24s on the chunk corpus, bit-identical (r16, guide section 7.2
    # "duplicated subtrees").
    q = quantized(F.col(vec_col))
    return df.withColumn("qvec", q).withColumn(
        "qnorm", int_dot(F.col("qvec"), F.col("qvec"))
    )


def cosine(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """dot / (sqrt(na) * sqrt(nb)) -- identical IEEE double both engines
    given identical integer inputs."""
    return dot.cast("double") / (
        F.sqrt(norm_a.cast("double")) * F.sqrt(norm_b.cast("double"))
    )


def _cogroup_topk_kernel(k: int, strike_self: bool = True, q_chunk: int = 1024):
    """Per-group (bucket/cell) query-vs-db top-k as one Arrow kernel:
    int64 gram matmul, IEEE float64 cosine in ``cosine()``'s operation
    order, per-query top-k under the total order (cosine desc,
    neighbor_id asc) via a stable argsort over the id-ascending db
    side -- bit-identical rows to the join + row_number shape it
    replaced (the per-pair higher-order int_dot is interpreted in
    Catalyst, ~12us/pair; the kernel is a BLAS matmul).

    ``strike_self``: drop (q, db) pairs with equal ids -- correct for
    self-join searches where both sides share one id space; MUST be
    False for external queries (ivf_search_index), whose caller-chosen
    query ids are unrelated to corpus ids and may collide with them.

    Memory contract: the db side is bounded by the callers' cell/
    bucket caps; the QUERY side is not (in self-search every cell
    member is a query), so queries are processed in ``q_chunk`` blocks
    -- the score matrix is at most q_chunk x cap floats regardless of
    how hot the group is.

    Zero-norm contract: a zero-quantizing vector (every |coord| <
    0.5/SCALE -> qnorm 0) has undefined cosine (0/0). The kernel
    DROPS such pairs -- the DuckDB-oracle behavior (0/0 is NULL there
    and fails every comparison). The ANSI expression shape would
    instead raise DIVIDE_BY_ZERO; dropping is the deliberate,
    oracle-consistent choice.

    Emits at most k rows per (group, query); callers that place one
    query in several groups (multi-probe) re-rank globally with the
    same-order window, which is exact: a global top-k under a total
    order is contained in the union of per-group top-ks."""
    import numpy as np
    import pandas as pd

    empty = {
        "query_id": np.array([], dtype=np.int64),
        "neighbor_id": np.array([], dtype=np.int64),
        "cosine": np.array([], dtype=np.float64),
    }

    def kernel(qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(dpdf):
            return pd.DataFrame(empty)
        d_order = np.argsort(dpdf["neighbor_id"].to_numpy())
        d_ids = dpdf["neighbor_id"].to_numpy()[d_order].astype(np.int64)
        d_mat = np.stack(dpdf["qvec"].to_numpy()[d_order]).astype(np.int64)
        d_den = np.sqrt(dpdf["qnorm"].to_numpy()[d_order].astype(np.int64).astype(np.float64))
        all_q_ids = qpdf["query_id"].to_numpy().astype(np.int64)
        all_q_mat = np.stack(qpdf["qv"].to_numpy()).astype(np.int64)
        all_q_den = np.sqrt(qpdf["qn"].to_numpy().astype(np.int64).astype(np.float64))
        outs = []
        for s in range(0, len(all_q_ids), q_chunk):
            q_ids = all_q_ids[s : s + q_chunk]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = (all_q_mat[s : s + q_chunk] @ d_mat.T).astype(np.float64) / (
                    all_q_den[s : s + q_chunk, None] * d_den[None, :]
                )
            # rank key: -cos; struck self-matches and undefined
            # (zero-norm NaN) entries rank LAST and are masked out
            key = -cos
            drop = np.isnan(cos)
            if strike_self:
                pos = np.searchsorted(d_ids, q_ids)
                hit = (pos < len(d_ids)) & (
                    d_ids[np.minimum(pos, len(d_ids) - 1)] == q_ids
                )
                drop[np.where(hit)[0], pos[hit]] = True
            key[drop] = np.inf
            # stable argsort on the key keeps the id-ascending tie order
            top = np.argsort(key, axis=1, kind="stable")[:, :k]
            n_take = min(k, cos.shape[1])
            keep = ~np.take_along_axis(drop, top, axis=1).reshape(-1)
            outs.append(
                {
                    "query_id": np.repeat(q_ids, n_take)[keep],
                    "neighbor_id": d_ids[top].reshape(-1)[keep],
                    "cosine": np.take_along_axis(cos, top, axis=1).reshape(-1)[keep],
                }
            )
        return pd.DataFrame(
            {c: np.concatenate([o[c] for o in outs]) for c in empty}
        )

    return kernel


_PAIR_TOPK_SCHEMA = "query_id bigint, neighbor_id bigint, cosine double"


def _global_topk(sim: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
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

    Scale shape (r6 rework of the r4 single-scan directive): the query
    set is collected to the driver -- it is request-sized by contract
    (a rerank stage's handful of probes; the ``query_ids`` list is
    already driver-resident) -- after a pushed-down id filter, and
    ships inside an Arrow ``mapInPandas`` closure. Each corpus batch
    then scores against the whole query matrix as ONE int64 numpy
    matmul with per-batch top-k; a final window over the
    O(partitions x queries x k) survivors produces the exact global
    top-k. ONE corpus scan, zero shuffles of corpus data, no
    checkpoint materialization, and no interpreted per-pair
    higher-order dot (~12us/pair in the join shape this replaced --
    measured 26s for 10 queries x 200k vectors; the kernel runs the
    same in ~2s, scan-bound).

    Caching post-mortem (r5, referenced by the localCheckpoint
    comments across this module, dedup.py, and corpus.py): the r5
    build pinned shared subtrees with plan-keyed ``persist()`` (SQL
    cache). Under the full 34-query driver bench the never-unpersisted
    columnar entries (wide array<bigint> columns, expensive
    InMemoryRelation builds) overflowed the 8g driver's storage pool
    and evicted each other, so every call re-paid the cache BUILD and
    got no reuse: ann_ivf_topk 1.85->4.90s, dedup_embedding_cosine
    1.97->4.53s (BENCH_r05). Policy since: immutable intra-query pins
    use ``localCheckpoint`` (RDD block pin, no columnar rebuild),
    cross-query reuse goes through explicit per-session structures
    (queries_catalog._ivf_index, cluster cache) -- enforced by
    test_plan_shapes.test_no_unbounded_sql_cache_in_package."""
    import numpy as np
    import pandas as pd

    q_rows = sorted(
        with_quantized(corpus.filter(F.col(id_col).isin(query_ids)), vec_col)
        .select(F.col(id_col).alias("query_id"), "qvec", "qnorm")
        .collect(),
        key=lambda r: r["query_id"],
    )
    if not q_rows:
        return corpus.sparkSession.createDataFrame([], _PAIR_TOPK_SCHEMA)
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["qvec"], dtype=np.int64) for r in q_rows])
    q_den = np.sqrt(
        np.array([r["qnorm"] for r in q_rows], dtype=np.int64).astype(np.float64)
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            order = np.argsort(pdf["neighbor_id"].to_numpy())
            d_ids = pdf["neighbor_id"].to_numpy()[order].astype(np.int64)
            d_mat = np.stack(pdf["qvec"].to_numpy()[order]).astype(np.int64)
            d_den = np.sqrt(
                pdf["qnorm"].to_numpy()[order].astype(np.int64).astype(np.float64)
            )
            cos = (q_mat @ d_mat.T).astype(np.float64) / (
                q_den[:, None] * d_den[None, :]
            )
            pos = np.searchsorted(d_ids, q_ids)
            hit = (pos < len(d_ids)) & (
                d_ids[np.minimum(pos, len(d_ids) - 1)] == q_ids
            )
            cos[np.where(hit)[0], pos[hit]] = -np.inf
            top = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            n_take = top.shape[1]
            rows_c = np.take_along_axis(cos, top, axis=1).reshape(-1)
            keep = rows_c > -np.inf
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_take)[keep],
                    "neighbor_id": d_ids[top].reshape(-1)[keep],
                    "cosine": rows_c[keep],
                }
            )

    # metadata-filtered search (`neighbor_filter` over the corpus'
    # non-vector columns) restricts the candidate side only -- queries
    # outside the filter still search
    cand = corpus if neighbor_filter is None else corpus.filter(neighbor_filter)
    sim = (
        with_quantized(cand, vec_col)
        .select(F.col(id_col).alias("neighbor_id"), "qvec", "qnorm")
        .mapInPandas(kernel, _PAIR_TOPK_SCHEMA)
    )
    return _global_topk(sim, k)


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
        F.col("bucket").alias("bk_q"),
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    b = _sampled_neighbors(base, sizes, ["bucket"], id_col, max_bucket_size).select(
        F.col("bucket").alias("bk_d"), F.col(id_col).alias("neighbor_id"), "qvec", "qnorm"
    )
    # One bucket-key shuffle (the cogroup), one gram matmul per bucket
    # (see _cogroup_topk_kernel -- replaces the bucket self-join whose
    # per-pair interpreted dot dominated at scale); each query lives in
    # exactly one bucket, so the global window only finalizes ranks.
    # NOTE on exchange width (r16): the query-frame search
    # (retrieval.ivf_search_frame) pins its cogroup width with an
    # explicit repartition because AQE's byte-based coalescing
    # single-tasked its CPU-dense probe (measured, and the fix showed
    # a 1.88x 8-vs-32-core ratio at 10x volume). The SAME pin was
    # tried HERE and measured counterproductive at every volume we
    # can generate locally: +0.65s on ann_pq_recall_bounds at sf0.1
    # (python-worker fan-out over near-empty groups) and an INVERTED
    # 0.20x core ratio on the 20k-vector semantic-dedup probe --
    # these self-search inputs are orders of magnitude smaller than a
    # chunk corpus. Left AQE-adaptive; revisit only with a measured
    # volume where the per-group matmul dominates worker dispatch.
    sim = (
        a.groupBy("bk_q")
        .cogroup(b.groupBy("bk_d"))
        .applyInPandas(
            lambda q, d: _cogroup_topk_kernel(k)(q, d), _PAIR_TOPK_SCHEMA
        )
    )
    return _global_topk(sim, k)


def ivf_centroids(
    corpus: DataFrame,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_hash: bool = False,
    _base: DataFrame | None = None,
) -> DataFrame:
    """Deterministic IVF centroid seed set: every ``stride``-th vector
    by id. Stands in for a k-means codebook (which would be refined
    offline and read from a table) while keeping the assignment
    SQL-expressible for the oracle; the downstream plan shape --
    broadcast codebook, shuffle on cell -- is the real IVF one.

    ``seed_hash=True`` seeds on ``pmod(xxhash64(id), stride) == 0``
    instead of the raw id modulus: REQUIRED when the id space is
    structured (e.g. semsearch's packed ``doc_id * 2^20 + chunk_id``
    keys, where raw ``% stride`` degenerates -- stride 50 and stride
    200 select the SAME seed set because both reduce to
    ``doc_id % 25 == 0``), so n_cells actually tracks n_vectors /
    stride. A tiny corpus that hashes to zero seeds falls back to the
    min-id vector (one extra build-time action, never on the query
    path).

    ``_base``: an already-quantized (id, qvec, qnorm) frame to seed
    from instead of re-deriving ``with_quantized(corpus)`` -- the
    index builders pass their pinned base so the (possibly expensive)
    embedding lineage is evaluated once, not once per consumer
    (r16, guide section 5). Same rows, same seeds."""
    base = _base if _base is not None else with_quantized(corpus, vec_col)
    if seed_hash:
        seeds = base.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0
        )
        if seeds.isEmpty():
            seeds = base.orderBy(id_col).limit(1)
    else:
        seeds = base.filter((F.col(id_col) % stride) == 0)
    return seeds.select(
        F.col(id_col).alias("cent_id"),
        F.col("qvec").alias("cv"),
        F.col("qnorm").alias("cn"),
    )


def _assign_against(
    base: DataFrame, codebook: DataFrame, id_col: str, with_cos: bool = False
) -> DataFrame:
    """(id, cell, qvec, qnorm): each vector of ``base`` assigned to its
    max-cosine centroid of ``codebook`` (tie -> lowest centroid id).
    ``with_cos=True`` appends ``cent_cos`` (the winning cosine itself,
    IEEE float64 in the exact-int-gram operation order) for consumers
    that rank members by centroid proximity (semantic_dedup).

    Scale shape: the codebook collects to the driver -- bounded by
    construction at O(sqrt n) cells (the IVF contract; ~50 MB even for
    a 100k-cell codebook) -- and ships to executors inside an Arrow
    ``mapInPandas`` kernel closure: each vector batch scores against
    the whole centroid matrix as ONE int64 numpy matmul + row argmax.
    The corpus never shuffles and never materializes (vector, centroid)
    pair rows.

    This replaced a crossJoin(broadcast(codebook)) + struct-MAX shape
    (r6): the per-pair 64-term higher-order ``int_dot`` is interpreted
    (Catalyst does not codegen higher-order functions, ~12us/pair), so
    index builds went superlinear in wall-clock as the codebook grew --
    41.8s for a 20k x 125-cell assignment vs ~1s for the kernel. Math
    is bit-identical: exact int64 gram (dims * SCALE^2 * |x|^2 << 2^63),
    cosine divided in IEEE float64 in the same operation order, and
    argmax tie-break = first max over centroids pre-sorted by cent_id
    ascending == the struct MAX's lowest-cent_id rule (asserted
    equivalent by test)."""
    import numpy as np
    import pandas as pd

    rows = codebook.select("cent_id", "cv", "cn").orderBy("cent_id").collect()
    if not rows:
        raise ValueError("empty IVF codebook")
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cents = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in rows])
    cent_den = np.sqrt(np.array([r["cn"] for r in rows], dtype=np.int64).astype(np.float64))

    out_schema = f"{id_col} bigint, cell bigint, qvec array<bigint>, qnorm bigint"
    if with_cos:
        out_schema += ", cent_cos double"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            qn = pdf["qnorm"].to_numpy().astype(np.int64)
            gram = mat @ cents.T  # exact int64
            cos = gram.astype(np.float64) / (
                np.sqrt(qn.astype(np.float64))[:, None] * cent_den[None, :]
            )
            j = np.argmax(cos, axis=1)  # first max == lowest cent_id on ties
            out = {
                id_col: pdf[id_col].to_numpy().astype(np.int64),
                "cell": cent_ids[j],
                "qvec": pdf["qvec"],
                "qnorm": qn,
            }
            if with_cos:
                out["cent_cos"] = cos[np.arange(len(j)), j]
            yield pd.DataFrame(out)

    return base.select(F.col(id_col), "qvec", "qnorm").mapInPandas(kernel, out_schema)


def ivf_kmeans_codebook(
    corpus: DataFrame,
    stride: int = 50,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_modulus: int = 1,
    seed_hash: bool = False,
    _base: DataFrame | None = None,
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
    # ``_base``: an already-quantized-and-pinned (id, qvec, qnorm)
    # frame (build_ivf_index passes its shared pin). Without it the
    # seed pass and the Lloyd train base each re-derive the quantized
    # lineage -- for semsearch's chunk index that lineage is the chunk
    # explode + hashed-TF-IDF transform, and the repeated giant plans
    # were the "plan string too large" 35-160s cold pass (r15 VERDICT
    # #4). The standalone path keeps quantizing only the train subset
    # (train_modulus > 1 exists so training never touches the full
    # corpus); the shared-base path already has the full corpus
    # quantized because its caller assigns every vector afterwards.
    if _base is not None:
        base = _base if train_modulus <= 1 else _base.filter(
            (F.col(id_col) % train_modulus) == 0
        ).localCheckpoint(eager=False)
        codebook = ivf_centroids(
            corpus, stride, id_col, vec_col, seed_hash, _base=_base
        )
    else:
        train = corpus if train_modulus <= 1 else corpus.filter(
            (F.col(id_col) % train_modulus) == 0
        )
        base = with_quantized(train, vec_col).select(
            F.col(id_col), "qvec", "qnorm"
        ).localCheckpoint(eager=False)  # iters+1 passes read one computed scan
        codebook = ivf_centroids(corpus, stride, id_col, vec_col, seed_hash)
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
    cells (multi-probe query expansion): the same Arrow argmax kernel
    as ``_assign_against``, taking the p best columns per row instead
    of one. The stable argsort over centroids pre-sorted by cent_id
    ascending reproduces the expression shape's tie-break exactly
    (csim desc, then cent_id asc). Replaced a crossJoin + collect_list
    shape (r6) that materialized one struct per (vector, centroid) --
    O(n * cells) shuffle rows, the same interpreted-HOF scale cliff as
    the old single-probe assignment."""
    import numpy as np
    import pandas as pd

    rows = codebook.select("cent_id", "cv", "cn").orderBy("cent_id").collect()
    if not rows:
        raise ValueError("empty IVF codebook")
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cents = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in rows])
    cent_den = np.sqrt(
        np.array([r["cn"] for r in rows], dtype=np.int64).astype(np.float64)
    )
    out_schema = f"{id_col} bigint, cell bigint, qvec array<bigint>, qnorm bigint"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["qvec"].to_numpy()).astype(np.int64)
            qn = pdf["qnorm"].to_numpy().astype(np.int64)
            cos = (mat @ cents.T).astype(np.float64) / (
                np.sqrt(qn.astype(np.float64))[:, None] * cent_den[None, :]
            )
            top = np.argsort(-cos, axis=1, kind="stable")[:, :p]
            n_take = top.shape[1]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy().astype(np.int64), n_take),
                    "cell": cent_ids[top].reshape(-1),
                    "qvec": pdf["qvec"].to_numpy().repeat(n_take),
                    "qnorm": qn.repeat(n_take),
                }
            )

    return base.select(F.col(id_col), "qvec", "qnorm").mapInPandas(kernel, out_schema)


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
        F.col("cell").alias("cell_q"),
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    b = _sampled_neighbors(assigned, sizes, ["cell"], id_col, max_cell_size).select(
        F.col("cell").alias("cell_d"), F.col(id_col).alias("neighbor_id"), "qvec", "qnorm"
    )
    # One cell-key shuffle (the cogroup), one gram matmul per cell --
    # replaces the cell-key pair join whose per-pair interpreted
    # higher-order dot made probes superlinear in wall-clock (measured
    # 79s for 200k vectors at cap 1024; the kernel runs the same shape
    # in a few seconds). The window re-ranks globally, which multi-probe
    # queries (one query in n_probes cells) require for exactness.
    # Exchange width left AQE-adaptive: see the measured note on the
    # bucket self-search above (the explicit width pin helps the
    # query-frame search in retrieval.py but was measured
    # counterproductive on these self-search volumes).
    sim = (
        a.groupBy("cell_q")
        .cogroup(b.groupBy("cell_d"))
        .applyInPandas(
            lambda q, d: _cogroup_topk_kernel(k)(q, d), _PAIR_TOPK_SCHEMA
        )
    )
    return _global_topk(sim, k)


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
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = gram.astype(np.float64) / (denom[:, None] * denom[None, :])
        iu, ju = np.triu_indices(len(ids), k=1)
        up = cos[iu, ju]
        # zero-norm (qnorm 0) pairs have undefined cosine (NaN here,
        # NULL in the DuckDB oracle) and fail the threshold in both --
        # dropped, deliberately (the ANSI expression shape would throw)
        keep = up >= threshold
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


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.92,
    stride: int = 50,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int = 1024,
    dims: int = 64,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster-then-prune over
    embeddings, per Abbas et al. 2023): k-means-cluster the corpus,
    and inside each cluster drop every member that has a neighbor with
    cosine >= ``threshold`` sitting CLOSER to the centroid -- keeping,
    per duplicate neighborhood, the member farthest from the centroid
    (the diversity-preserving keep rule), deterministically (ties by
    lowest id).

    The drop rule is a pure pair predicate -- member x is dropped iff
    some same-cell y has cos(x, y) >= threshold and (cent_cos_y,
    y.id) < (cent_cos_x, x.id) lexicographically (centroid cosine
    ascending = farthest first) -- so the verdict needs no sequential
    scan, no connected components, and both engines evaluate it
    identically (the cosines are exact-int64 gram / float64 divides in
    one operation order on both sides).

    Scale shape: clustering is the existing IVF machinery (broadcast
    codebook, corpus never shuffles to be assigned); within-cell pairs
    reuse the near-dup contract -- cells at or under ``max_cell_size``
    get the exact Arrow all-pairs kernel over the SAME cell shuffle,
    oversized cells degrade to star pairs against the cell rep
    (documented recall cost of a degenerate cell, never all-pairs);
    dominance resolution is two id-keyed joins of the pair list
    against the bounded (id, cent_cos) side table and one distinct.

    Output: (id, cell, kept) -- one row per corpus vector; dropped
    rows are the semantic duplicates."""
    cb = (
        codebook
        if codebook is not None
        else ivf_kmeans_codebook(corpus, stride, iters, dims, id_col, vec_col)
    )
    base = with_quantized(corpus, vec_col).select(F.col(id_col), "qvec", "qnorm")
    assigned = _assign_against(base, cb, id_col, with_cos=True).localCheckpoint(
        eager=False
    )  # index-build pin: pairs, dominance, and the verdict all read it
    sizes = bucket_sizes(assigned, ["cell"], id_col)
    small = assigned.join(
        F.broadcast(sizes.filter(F.col("n") <= max_cell_size).select("cell")), "cell"
    )
    small_pairs = (
        small.select(
            F.col(id_col).alias("vec_id"), F.col("cell").alias("bucket"), "qvec", "qnorm"
        )
        .groupBy("bucket")
        .applyInPandas(
            _allpairs_cosine_kernel(threshold), "id_a bigint, id_b bigint, cosine double"
        )
    )
    reps = (
        assigned.join(
            F.broadcast(
                sizes.filter(F.col("n") > max_cell_size).select("cell", "rep")
            ),
            "cell",
        )
        .filter(F.col(id_col) == F.col("rep"))
        .select(
            F.col("cell").alias("cell_r"),
            F.col("rep").alias("id_a"),
            F.col("qvec").alias("rv"),
            F.col("qnorm").alias("rn"),
        )
    )
    big_pairs = (
        assigned.join(F.broadcast(reps), F.col("cell") == F.col("cell_r"))
        .filter(F.col(id_col) != F.col("id_a"))
        .select(
            "id_a",
            F.col(id_col).alias("id_b"),
            cosine(
                int_dot(F.col("rv"), F.col("qvec")), F.col("rn"), F.col("qnorm")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    pairs = small_pairs.unionByName(big_pairs)
    cc = assigned.select(F.col(id_col), "cent_cos")
    dom = (
        pairs.join(
            cc.select(F.col(id_col).alias("id_a"), F.col("cent_cos").alias("cos_a")),
            "id_a",
        )
        .join(
            cc.select(F.col(id_col).alias("id_b"), F.col("cent_cos").alias("cos_b")),
            "id_b",
        )
        .select(
            F.when(
                (F.col("cos_a") > F.col("cos_b"))
                | ((F.col("cos_a") == F.col("cos_b")) & (F.col("id_a") > F.col("id_b"))),
                F.col("id_a"),
            )
            .otherwise(F.col("id_b"))
            .alias(id_col)
        )
        .distinct()
    )
    return assigned.join(
        dom.withColumn("__dropped", F.lit(True)), on=id_col, how="left"
    ).select(
        F.col(id_col),
        "cell",
        F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: the build-once / probe-many contract as warehouse
# tables (the per-session _ivf_index cache in queries_catalog is the
# in-process shadow of this). The assignment table is PARTITIONED BY
# cell, so a probe reads only its probed cells' partitions -- at 100 TB
# a k-NN search touches O(n_probes * cell_cap) rows of storage, not the
# corpus.
# ---------------------------------------------------------------------------


def build_ivf_index(
    wh,
    corpus: DataFrame,
    name: str,
    stride: int = 50,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_modulus: int = 1,
    extra_tables: list | None = None,
    seed_hash: bool = False,
) -> dict:
    """Train the k-means codebook and materialize the full cell
    assignment as two warehouse tables: ``<name>.codebook``
    (cent_id, cv, cn) and ``<name>.assignment`` (id, cell, qvec,
    qnorm), the latter partitioned by cell for probe-side partition
    pruning. Returns {"cells": n, "vectors": n}.

    Re-running the build overwrites both tables atomically (warehouse
    generation commit), so index refresh is crash-safe and readers
    never see a half-built index. ``extra_tables``: [(table, df)]
    caller sidecars (e.g. semsearch's embed geometry) overwritten in
    the SAME transaction -- a sidecar committed separately could pair
    a new index with stale metadata after a crash between commits."""
    # Quantize the corpus ONCE and pin it: the seed pass, the Lloyd
    # refinement, and the final full-corpus assignment below all read
    # this one materialized scan. Before r16 each of the three
    # re-derived the caller's full embedding lineage -- for semsearch's
    # chunk index (chunk explode + hashed-TF-IDF + 64-dim quantize)
    # that tripled the work AND built Catalyst plans big enough to
    # trip the "plan string too large" warning, the diagnosed source
    # of the 35-160s semantic_decontaminate_flags cold pass (r15
    # VERDICT #4). Lazy pin: the first action (the seed collect)
    # materializes it; every later consumer reads a LogicalRDD, so
    # downstream plans are O(1) in the corpus lineage.
    qbase = with_quantized(corpus, vec_col).select(
        F.col(id_col), "qvec", "qnorm"
    ).localCheckpoint(eager=False)
    codebook = ivf_kmeans_codebook(
        corpus, stride, iters, dims, id_col, vec_col, train_modulus, seed_hash,
        _base=qbase,
    ).localCheckpoint(eager=True)
    assigned = _assign_against(qbase, codebook, id_col)
    cb_name, as_name = f"{name}.codebook", f"{name}.assignment"
    cfg_name = f"{name}.build_config"
    spark = corpus.sparkSession
    import json as _json

    cfg_df = spark.createDataFrame(
        [(_json.dumps({"stride": stride, "iters": iters, "dims": dims,
                       "id_col": id_col, "vec_col": vec_col,
                       "train_modulus": train_modulus,
                       "seed_hash": seed_hash}),)],
        "config string",
    )
    if not wh.exists(cb_name):
        wh.create_table(cb_name, codebook.schema)
    if not wh.exists(as_name):
        wh.create_table(as_name, assigned.schema, partition_by=["cell"])
    if not wh.exists(cfg_name):
        wh.create_table(cfg_name, cfg_df.schema)
    extra = extra_tables or []
    for t, df in extra:
        if not wh.exists(t):
            wh.create_table(t, df.schema)
    # ONE transaction for both tables: two independent commits could
    # crash in between and leave the new codebook paired with the old
    # assignment -- probes would then pick cells against centroids the
    # stored cells were never assigned to (wrong/empty neighbors, no
    # error). The journal roll-forward makes the pair land together or
    # not at all.
    # the build geometry rides in the SAME transaction: a rebuild that
    # cannot recover stride/dims/columns would silently retrain at
    # defaults and change quantization geometry under the searcher
    with wh.transaction([cb_name, as_name, cfg_name, *[t for t, _ in extra]]) as txn:
        # coalesce(1): the codebook is bounded at O(sqrt n) cells
        # (~50 MB even at 100k cells), but the eager pin spreads it
        # over defaultParallelism partitions -- writing those was 32
        # near-empty files per build (guide section 6 small-files);
        # one task drains the pinned blocks with no shuffle
        txn.overwrite(cb_name, codebook.coalesce(1))
        txn.overwrite(as_name, assigned)
        txn.overwrite(cfg_name, cfg_df)
        for t, df in extra:
            txn.overwrite(t, df)
    # Stats from the already-materialized pins, not a re-read of the
    # written parquet (two extra scan jobs per build, r16 guide
    # section 5): the assignment kernel emits exactly one row per
    # qbase row, so vectors == the pinned base count.
    return {
        "cells": codebook.count(),
        "vectors": qbase.count(),
    }


def ivf_topk_from_index(
    wh,
    name: str,
    k: int = 5,
    max_cell_size: int = 1024,
    n_probes: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs top-k probing a PERSISTED index: reads the assignment
    table (no scoring pass, no codebook broadcast for single-probe)
    and runs the capped cell-key kernel only -- the steady-state cost
    a production deployment pays per query wave."""
    assigned = wh.read(f"{name}.assignment")
    cb = wh.read(f"{name}.codebook") if n_probes > 1 else None
    return ivf_topk(
        assigned,
        k=k,
        max_cell_size=max_cell_size,
        codebook=cb,
        n_probes=n_probes,
        id_col=id_col,
        assigned=assigned,
    )


def ivf_search_index(
    wh,
    name: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_probes: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """k-NN search for EXTERNAL query vectors against a persisted
    index: quantize the queries driver-side (HALF_UP, matching
    F.round's rule exactly), score them against the collected codebook
    (O(queries x cells) numpy), then read ONLY the probed cells from
    the partitioned assignment table -- the scan partition-prunes to
    n_probes cells per query, which is what makes a single search
    cheap at any corpus size.

    ``queries``: [(query_id, vector)] with driver-resident vectors
    (request-sized by contract). Output: (query_id, neighbor_id,
    cosine), exact within the probed cells. Query ids live in the
    CALLER's id space: a corpus vector with the same numeric id is a
    legitimate neighbor (strike_self=False in the kernel)."""
    import numpy as np

    if not queries:  # empty request: empty result, not a numpy AxisError
        return wh.spark.createDataFrame([], _PAIR_TOPK_SCHEMA)
    rows = wh.read(f"{name}.codebook").select("cent_id", "cv", "cn").orderBy("cent_id").collect()
    if not rows:
        raise ValueError(f"index {name} has an empty codebook")
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cents = np.stack([np.asarray(r["cv"], dtype=np.int64) for r in rows])
    cent_den = np.sqrt(np.array([r["cn"] for r in rows], dtype=np.int64).astype(np.float64))

    vecs = np.array([v for _, v in queries], dtype=np.float64)
    # HALF_UP quantization == F.round: floor(|x|*S + 0.5) with sign
    qm = (np.sign(vecs) * np.floor(np.abs(vecs) * SCALE + 0.5)).astype(np.int64)
    qn = (qm * qm).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = (qm @ cents.T).astype(np.float64) / (
            np.sqrt(qn.astype(np.float64))[:, None] * cent_den[None, :]
        )
    # a zero-norm centroid (degenerate Lloyd cell rounded to the zero
    # vector) or zero-norm query yields NaN: rank it LAST, never probed
    # ahead of a real cell (NaNs would otherwise land wherever argsort
    # leaves them)
    cos = np.nan_to_num(cos, nan=-np.inf)
    top = np.argsort(-cos, axis=1, kind="stable")[:, : max(1, n_probes)]
    probe_cells = sorted({int(c) for c in cent_ids[top].reshape(-1)})

    spark = wh.spark
    q_rows = [
        (int(qid), [int(x) for x in qm[i]], int(qn[i]), [int(c) for c in cent_ids[top[i]]])
        for i, (qid, _) in enumerate(queries)
    ]
    qdf = spark.createDataFrame(
        q_rows, "query_id bigint, qv array<bigint>, qn bigint, cells array<bigint>"
    ).select(
        F.explode("cells").alias("cell_q"), "query_id", "qv", "qn"
    )
    # partition-pruned read: only the probed cells' directories scan
    db = (
        wh.read(f"{name}.assignment")
        .filter(F.col("cell").isin(probe_cells))
        .select(
            F.col("cell").alias("cell_d"),
            F.col(id_col).alias("neighbor_id"),
            "qvec",
            "qnorm",
        )
    )
    sim = (
        qdf.groupBy("cell_q")
        .cogroup(db.groupBy("cell_d"))
        .applyInPandas(
            lambda q, d: _cogroup_topk_kernel(k, strike_self=False)(q, d),
            _PAIR_TOPK_SCHEMA,
        )
    )
    return _global_topk(sim, k)


def append_to_ivf_index(
    wh,
    new_vectors: DataFrame,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_touched_cells_only: bool = False,
) -> int:
    """Incremental index maintenance: assign ONLY the new vectors
    against the stored codebook and append them to the assignment
    table -- the steady-state ingest path (assigning a batch is one
    kernel pass over the batch; the existing assignment is untouched,
    and the append lands in the batch's cell partitions only).

    The codebook is NOT retrained: IVF recall degrades gracefully as
    the data distribution drifts from the trained centroids, and the
    production contract is periodic full rebuilds (build_ivf_index,
    atomic overwrite) on a schedule or a drift trigger -- the same
    posture as every warehouse-side secondary structure here (z-order,
    compaction). Returns the number of vectors appended."""
    codebook = wh.read(f"{name}.codebook")
    assigned = _assign_against(
        with_quantized(new_vectors, vec_col).select(F.col(id_col), "qvec", "qnorm"),
        codebook,
        id_col,
    ).localCheckpoint(eager=True)  # pin: read below, then written
    # Idempotent append: drop ids already present in the index, so a
    # replayed batch appends nothing. This is what makes the streaming
    # ingest's foreachBatch replay-safe: Structured Streaming's sink
    # contract is at-least-once, and a batch replayed after a
    # commit-then-crash must find its vectors present (the
    # scd2_dim_stream idempotent-merge posture).
    #
    # The DEFAULT probe is GLOBAL over ids: an id re-sent with a
    # CHANGED embedding can assign to a different cell, where a
    # cell-restricted probe would not see it and the one-row-per-id
    # invariant would break with a duplicate id in a second cell (r6
    # ADVICE). Append is not update -- the mutated re-send is ignored;
    # use a rebuild (or a delete+append) to move a vector. The global
    # probe is one semi-join pass over the assignment table's id column
    # (column-pruned scan; no broadcast hint -- batches usually fit and
    # AQE decides on measured size, the guarded-broadcast posture).
    #
    # ``probe_touched_cells_only=True`` restores the partition-pruned
    # probe for callers whose replays are BYTE-IDENTICAL by contract
    # (the streaming ingest: a replayed foreachBatch re-reads the same
    # source offsets, and assignment against the same stored codebook
    # is deterministic, so a replay can only land in its original
    # cells). There the probe reads just the batch's cell partitions,
    # never scanning the index -- the 100 TB steady-state path.
    existing = wh.read(f"{name}.assignment")
    if probe_touched_cells_only:
        touched = [r["cell"] for r in assigned.select("cell").distinct().collect()]
        existing = existing.filter(F.col("cell").isin(touched))
    existing_ids = existing.select(F.col(id_col)).join(
        assigned.select(F.col(id_col)), on=id_col, how="left_semi"
    )
    fresh = assigned.join(existing_ids, on=id_col, how="left_anti").localCheckpoint(
        eager=True
    )
    n = fresh.count()
    if n:
        wh.append(f"{name}.assignment", fresh.select(*assigned.columns))
    return n


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    decimals: int = 6,
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against its
    brute-force ground truth -- the eval harness that closes the ANN
    loop: IVF/LSH parameter sweeps (nprobe, bands, codebook size) are
    tuned by re-running this against a fixed exact result, exactly how
    recall curves are produced offline. Both inputs are
    (query_id, neighbor_id, ...) frames, e.g. ``ivf_topk`` vs
    ``brute_force_topk`` over the same queries.

    Shape: one inner join on (query, neighbor) counts hits, one
    (query) count of truth rows, a left join preserves queries the
    approximate index missed entirely (recall 0.0, not absent). All
    three shuffles hash on the query key; ground truth is k rows per
    query so every side is bounded by k x n_queries -- orders smaller
    than the corpus the top-k scanned.

    Output: (query_id, n_true, n_hit, recall)."""
    hits = (
        approx.select(query_col, neighbor_col)
        .join(exact.select(query_col, neighbor_col), on=[query_col, neighbor_col])
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    truth = exact.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_true"))
    return (
        truth.join(hits, on=query_col, how="left")
        .select(
            query_col,
            "n_true",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_true"),
                decimals,
            ).alias("recall"),
        )
    )


def ann_recall_summary(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    decimals: int = 6,
) -> DataFrame:
    """One-row macro recall report over ``ann_recall``: mean per-query
    recall, worst query, and the fraction of queries at perfect
    recall -- the dashboard row an index-tuning sweep ranks on."""
    r = ann_recall(approx, exact, query_col, neighbor_col, decimals=9)
    return r.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), decimals).alias("macro_recall"),
        F.round(F.min("recall"), decimals).alias("min_recall"),
        F.round(
            F.avg((F.col("recall") >= 1.0).cast("double")), decimals
        ).alias("frac_perfect"),
    )


def ivf_index_health(wh, name: str, imbalance_threshold: float = 4.0) -> dict:
    """Index-maintenance signal for a persisted IVF index: cell-size
    distribution of the assignment table plus the imbalance verdict
    that gates a rebuild.

    Ingest drift concentrates vectors in a few cells (append_to_ivf_index
    deliberately never retrains); a hot cell makes every probe that
    touches it scan-bound, the same failure mode as an LSH hot bucket.
    Cost: one column-pruned scan of the assignment table aggregated to
    <= n_cells rows (map-side combined), then a bounded driver reduce.
    ``imbalanced`` = max cell > threshold x mean cell -- the rebuild
    trigger the append path's docstring promises."""
    sizes = (
        wh.read(f"{name}.assignment")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_cells_live = len(sizes)
    n_codebook = wh.read(f"{name}.codebook").count()
    counts = [r["n"] for r in sizes]
    total = sum(counts)
    mx = max(counts) if counts else 0
    # mean over the CODEBOOK's cells, not the live ones: the worst
    # drift concentrates everything into a few cells, and a live-cell
    # mean would drive max/mean toward 1.0 exactly then -- all vectors
    # in one cell must read as maximal imbalance, not balance
    mean = total / n_codebook if n_codebook else 0.0
    return {
        "n_vectors": total,
        "n_codebook_cells": int(n_codebook),
        "n_live_cells": n_cells_live,
        "n_empty_cells": int(n_codebook) - n_cells_live,
        "max_cell": mx,
        "mean_cell": mean,
        "imbalance": (mx / mean) if mean else 0.0,
        "imbalanced": bool(mean and mx > imbalance_threshold * mean),
    }


def maybe_rebalance_ivf_index(
    wh,
    corpus: DataFrame,
    name: str,
    imbalance_threshold: float = 4.0,
    **build_kwargs,
) -> dict:
    """The rebuild trigger: measure index health and, ONLY when the
    cell distribution has drifted past the threshold, retrain the
    codebook and re-assign everything from ``corpus`` (the index's
    source of truth at rest) via ``build_ivf_index`` -- a single atomic
    two-table overwrite, so probes never see a half-rebalanced index.
    Returns {"action": "rebuilt"|"noop", "health": <pre-measure>,
    "health_after": <post-measure, rebuilt only>}.

    Scale contract: the health probe is one bounded aggregation; the
    rebuild is the build cost (one kernel assignment pass over the
    corpus) paid only when drift actually happened -- schedule this
    after ingest windows instead of rebuilding unconditionally."""
    health = ivf_index_health(wh, name, imbalance_threshold)
    if not health["imbalanced"]:
        return {"action": "noop", "health": health}
    # rebuild with the PERSISTED geometry (stride/dims/columns stored by
    # build_ivf_index in <name>.build_config); explicit build_kwargs
    # override individual fields deliberately, never by accident
    import json as _json

    cfg_name = f"{name}.build_config"
    if wh.exists(cfg_name):
        stored = _json.loads(wh.read(cfg_name).first()["config"])
    else:
        # An index built before build_config existed: silently falling
        # back to defaults would retrain at the wrong stride/dims/
        # columns -- the exact silent geometry change the config table
        # was added to prevent. Require the caller to restate the FULL
        # geometry explicitly.
        geometry = {"stride", "dims", "id_col", "vec_col"}
        missing = sorted(geometry - set(build_kwargs))
        if missing:
            raise ValueError(
                f"{cfg_name} is missing (index predates persisted build "
                f"configs) and build_kwargs does not restate the full "
                f"geometry: missing {missing}. Pass them explicitly or "
                f"rebuild via build_ivf_index."
            )
        stored = {}
    stored.update(build_kwargs)
    build_ivf_index(wh, corpus, name, **stored)
    return {
        "action": "rebuilt",
        "health": health,
        "health_after": ivf_index_health(wh, name, imbalance_threshold),
    }
