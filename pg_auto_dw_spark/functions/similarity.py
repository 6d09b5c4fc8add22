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
    base = with_quantized(corpus, vec_col).select(
        F.col(id_col), bucket.alias("bucket"), "qvec", "qnorm"
    )
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
    )
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
