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
) -> DataFrame:
    """Exact cosine top-k for a small query set against the corpus.

    Output: (query_id, neighbor_id, cosine) with deterministic ranking
    (cosine desc, neighbor id asc); self-matches excluded.
    """
    q = with_quantized(corpus, vec_col).filter(F.col(id_col).isin(query_ids))
    qs = q.select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "qvec", "qnorm"
    )
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


def lsh_bucket_topk(
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hyperplanes: bool = False,
    dims: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates restricted to the same
    LSH bucket; shuffle key = bucket, never the full cross join.
    ``hyperplanes=True`` switches from axis-aligned sign buckets (the
    oracle-friendly baseline) to seeded random hyperplanes (the scale
    path with better recall)."""
    bucket = (
        hyperplane_bucket(F.col(vec_col), dims, n_planes, seed)
        if hyperplanes
        else sign_bucket(F.col(vec_col), n_planes)
    )
    # Pin: both sides of the bucket self-join read the one computed
    # quantize+bucket pass instead of re-running it per side.
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), bucket.alias("bucket"), "qvec", "qnorm"
    ).localCheckpoint(eager=False)
    a = base.select(
        F.col(id_col).alias("query_id"),
        F.col("bucket").alias("bk_a"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    b = base.select(
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


def ivf_assign(
    corpus: DataFrame,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, qvec, qnorm): each vector assigned to its max-cosine
    centroid (tie -> lowest centroid id).

    Scale shape: the codebook broadcasts (IVF codebooks are small by
    construction -- O(sqrt(n)) cells); the corpus never shuffles for
    scoring. The per-vector argmax is a single MAX of a comparable
    struct with full map-side partial aggregation, so the exchange
    carries one row per vector, not one per (vector, centroid).

    The result is pinned (``localCheckpoint``): the assignment is an
    *index build* -- consumers (the pair join's two sides, repeated
    probes) must read the built index, not re-run the codebook scoring
    per reference. At warehouse scale the same role is played by
    writing the assignment to a table once and probing it many times."""
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), "qvec", "qnorm"
    )
    scored = base.crossJoin(F.broadcast(ivf_centroids(corpus, stride, id_col, vec_col))).select(
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
    ).localCheckpoint(eager=False)


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (single-probe) approximate all-pairs top-k: candidates are
    restricted to the query's own cell, so the pair join shuffles on
    the cell key only. Recall improves with multi-probe (join the
    next-nearest cells too) at proportional cost; brute_force_topk is
    the exact baseline."""
    assigned = ivf_assign(corpus, stride, id_col, vec_col)
    a = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col("cell").alias("cell_a"),
        F.col("qvec").alias("qv"),
        F.col("qnorm").alias("qn"),
    )
    b = assigned.select(
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


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup candidates: same sign bucket AND
    cosine >= threshold (id_a < id_b)."""
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), sign_bucket(F.col(vec_col), n_planes).alias("bucket"), "qvec", "qnorm"
    ).localCheckpoint(eager=False)  # one quantize pass feeds both join sides
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("bucket").alias("bk_a"),
        F.col("qvec").alias("qv"), F.col("qnorm").alias("qn"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("bucket").alias("bk_b"), "qvec", "qnorm"
    )
    return (
        a.join(b, (F.col("bk_a") == F.col("bk_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            cosine(int_dot(F.col("qv"), F.col("qvec")), F.col("qn"), F.col("qnorm")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )
