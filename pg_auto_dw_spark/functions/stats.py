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
        # moments computed by hand (conditional sums over the pairwise
        # non-null rows) instead of F.corr/F.covar_samp: under ANSI
        # mode the built-ins raise DIVIDE_BY_ZERO on a zero-variance
        # column, and the explicit form is the engine-portable math a
        # cross-engine oracle can replay. try_divide encodes the
        # contract: degenerate denominators yield NULL, never an error.
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        vx = F.when(both, F.col(x).cast("double"))
        vy = F.when(both, F.col(y).cast("double"))
        n = F.count(F.when(both, F.lit(1))).cast("double")
        sx, sy = F.sum(vx), F.sum(vy)
        sxx, syy, sxy = F.sum(vx * vx), F.sum(vy * vy), F.sum(vx * vy)
        cov_n = sxy - F.try_divide(sx * sy, n)  # n*cov (population x n)
        var_x = sxx - F.try_divide(sx * sx, n)
        var_y = syy - F.try_divide(sy * sy, n)
        corr = F.try_divide(cov_n, F.sqrt(var_x * var_y))
        # guard: float cancellation can leave a tiny negative variance
        # on a constant column; map it to NULL like zero variance
        corr = F.when((var_x > 0) & (var_y > 0), corr)
        covar = F.try_divide(cov_n, n - 1)
        aggs += [
            corr.alias(f"__r_{i}"),
            covar.alias(f"__c_{i}"),
            n.cast("long").alias(f"__n_{i}"),
        ]
    wide = df.groupBy(*keys).agg(*aggs)
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
