"""Approximate sketches: cardinality, quantiles, frequent items.

At 100 TB the exact forms of these are shuffle-bound (exact distinct
shuffles the distinct set; exact quantiles sort); the sketch forms are
single-pass, mergeable, and bounded-memory -- each partition builds a
fixed-size summary and the driver merges summaries, so cost is
O(partitions * sketch_size) regardless of data size. We use Spark's
built-in JVM sketch aggregates (HyperLogLog++ for distinct, a
Greenwald-Khanna-style summary for percentile_approx) rather than
reimplementing them in Python -- whole-stage codegen, zero Python in
the plan. For exact frequent items see `skew.heavy_hitters` (bounded
output by construction, no sketch needed).

Approximation means no bit-exact SQL oracle; correctness is checked by
error-bound tests against the exact answers (tests/test_sketch.py) and
the registered queries are rows-only driver checks, declared as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.02,
    alias: str = "approx_n_distinct",
) -> DataFrame:
    """Per-group HyperLogLog++ cardinality; ``rsd`` is the target
    relative standard deviation (sketch size ~ 1/rsd^2 bytes/group)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(alias)
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probs: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (one array column ``quantiles``
    aligned with ``probs``); rank error <= 1/accuracy of the group
    size. Single pass, mergeable summaries."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles")
    )


def equi_width_histogram(
    df: DataFrame,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Per-group equi-width histogram over ``[lo, hi)``: one row per
    (group, bucket) with a BIGINT count; out-of-range values clamp into
    the edge buckets so every NON-NULL value is counted exactly once
    (NULL measures are excluded up front -- Spark's greatest() skips
    null arguments, so without the filter a NULL would silently land
    in bucket 0 and corrupt the profile).

    This is the EXACT single-pass profile companion to the sketches
    above: bucket assignment is one codegen floor expression, the only
    shuffle is the map-side-combined (keys, bucket) count -- output is
    bounded at groups x n_buckets regardless of input size, the same
    mergeable-summary posture a 100 TB ANALYZE pass needs. Emitted
    columns are integers only (bucket index + count); callers derive
    bucket bounds as lo + bucket * (hi - lo) / n_buckets.

    Degenerate geometry is rejected up front (hi <= lo or
    n_buckets < 1 would yield NaN/Infinity bucket indexes silently),
    and NaN measures -- which isNotNull does NOT remove and which the
    clamp would otherwise sweep into the TOP bucket unnoticed -- are
    excluded like NULLs. drift_report composes this, so either defect
    would silently skew a PSI verdict."""
    if hi <= lo:
        raise ValueError(f"equi_width_histogram needs hi > lo, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    width = (hi - lo) / n_buckets
    df = df.filter(F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double")))
    v = F.col(col)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width))),
    ).cast("long")
    return (
        df.groupBy(*keys, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
