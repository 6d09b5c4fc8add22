"""Exact multi-column statistics: the one-pass grouped moment family.

``grouped_correlations`` computes the full pairwise correlation /
covariance matrix of a column set, per group, in ONE aggregation pass:
every (x, y) pair's corr and covar_samp are independent aggregate
expressions inside a single ``groupBy`` (Spark evaluates them together
-- one scan, map-side partial moments, one exchange of
groups x O(pairs) doubles), then a plan-level ``stack`` unpivot turns
the wide row into one row per (group, x, y). The same shape as
``catalog.profile.profile_table`` -- no per-pair scans, no Python.

At 100 TB this is the feature-correlation audit a training pipeline
runs over its quality signals: output is bounded at
groups x C(n_cols, 2), independent of row count.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_correlations(
    df: DataFrame,
    keys: list[str],
    cols: list[str],
) -> DataFrame:
    """One row per (group, col_x, col_y) pair (x < y in ``cols`` order)
    with ``corr``, ``covar_samp`` and the pair's non-null row count.
    Rows where either side is NULL are excluded pairwise (the SQL
    corr/covar contract). A constant column yields NULL corr (zero
    variance), never an error."""
    if len(cols) < 2:
        raise ValueError("grouped_correlations needs at least two columns")
    pairs = list(combinations(cols, 2))
    aggs = []
    for i, (x, y) in enumerate(pairs):
        # built-in co-moment aggregates (covar_samp / stddev_samp use
        # Welford-style accumulation) over PAIRWISE non-null inputs:
        # the naive sum-of-squares form (sxx - sx*sx/n) catastrophically
        # cancels in doubles when |mean| >> spread (epoch-millisecond
        # timestamps lose the entire variance to the subtraction). The
        # correlation is assembled AFTER aggregation with try_divide,
        # so a zero-variance side yields NULL under ANSI mode instead
        # of DIVIDE_BY_ZERO (the built-in F.corr raises there).
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        vx = F.when(both, F.col(x).cast("double"))
        vy = F.when(both, F.col(y).cast("double"))
        aggs += [
            F.covar_samp(vx, vy).alias(f"__c_{i}"),
            F.stddev_samp(vx).alias(f"__sx_{i}"),
            F.stddev_samp(vy).alias(f"__sy_{i}"),
            F.count(F.when(both, F.lit(1))).alias(f"__n_{i}"),
        ]
    wide = df.groupBy(*keys).agg(*aggs)
    wide = wide.select(
        *keys,
        *[
            c
            for i in range(len(pairs))
            for c in (
                F.try_divide(
                    F.col(f"__c_{i}"), F.col(f"__sx_{i}") * F.col(f"__sy_{i}")
                ).alias(f"__r_{i}"),
                F.col(f"__c_{i}"),
                F.col(f"__n_{i}"),
            )
        ],
    )
    stack_args = ", ".join(
        f"'{x}', '{y}', __r_{i}, __c_{i}, __n_{i}" for i, (x, y) in enumerate(pairs)
    )
    return wide.selectExpr(
        *keys,
        f"stack({len(pairs)}, {stack_args}) AS "
        "(col_x, col_y, corr, covar_samp, n_pairs)",
    )


def drift_report(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    epsilon: float = 1e-4,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column, per group: the standard data-drift monitor a corpus
    pipeline runs between ingest windows (PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted -- the usual reading).

    Composes ``sketch.equi_width_histogram`` on both sides (one
    map-side-combined count each, bounded at groups x buckets), joins
    the bucket vectors full-outer (absent bucket = zero, floored at
    ``epsilon`` so the log term is defined -- the standard PSI
    smoothing), and reduces to one row per group:
    (keys..., psi, n_old, n_new). Output bounded at the group count;
    nothing here scales with row count beyond the two histogram
    scans."""
    from .sketch import equi_width_histogram

    h_old = equi_width_histogram(old, keys, col, lo, hi, n_buckets)
    h_new = equi_width_histogram(new, keys, col, lo, hi, n_buckets)
    return psi_from_histograms(h_old, h_new, keys, epsilon)


def psi_from_histograms(
    h_old: DataFrame,
    h_new: DataFrame,
    keys: list[str],
    epsilon: float = 1e-4,
) -> DataFrame:
    """PSI from two precomputed (keys..., bucket, cnt) histograms --
    the reusable core of ``drift_report``, split out so callers holding
    a FIXED reference histogram (the streaming drift monitor, a stats
    table in the warehouse) pay only the new side's scan per
    comparison. Both inputs are bounded at groups x buckets; everything
    here is group-sized."""
    join_cols = [*keys, "bucket"]
    j = (
        h_old.withColumnRenamed("cnt", "cnt_old")
        .join(h_new.withColumnRenamed("cnt", "cnt_new"), join_cols, "full_outer")
        .fillna(0, subset=["cnt_old", "cnt_new"])
    )
    totals = (
        j.groupBy(*keys)
        .agg(
            F.sum("cnt_old").alias("n_old"),
            F.sum("cnt_new").alias("n_new"),
        )
    )
    j = j.join(totals, keys)
    p = F.greatest(F.lit(epsilon), F.try_divide(F.col("cnt_old"), F.col("n_old")))
    q = F.greatest(F.lit(epsilon), F.try_divide(F.col("cnt_new"), F.col("n_new")))
    term = (q - p) * F.log(q / p)
    return (
        j.groupBy(*keys, "n_old", "n_new")
        .agg(F.sum(term).alias("psi"))
        .select(*keys, "psi", "n_old", "n_new")
    )
