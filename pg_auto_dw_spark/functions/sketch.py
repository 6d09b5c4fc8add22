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


def ndv_sketch_rows(
    df: DataFrame,
    cols: list[str],
    lg_k: int = 12,
    keys: list[str] | None = None,
) -> DataFrame:
    """One row per (keys..., column): (keys..., col_name, sketch
    BINARY) -- Apache DataSketches HLL state via Spark's built-in
    ``hll_sketch_agg`` (JVM aggregate, whole-stage codegen), the
    MERGEABLE form of ``approx_distinct``. ONE scan for all columns:
    the frame melts to (keys, col_name, value) and aggregates per
    (keys, column-name) -- N columns never cost N passes. NULLs are
    excluded per column (the NDV convention profile_table uses);
    values hash via their string form so heterogeneous column types
    share one melt. ``keys`` (e.g. ["source"]) gives per-group NDV --
    per-source distinct users, per-language distinct domains -- at one
    group-keyed shuffle, still mergeable per group."""
    if not cols:
        raise ValueError("ndv_sketch_rows needs at least one column")
    keys = keys or []
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("string").alias("value"),
            )
            for c in cols
        ]
    )
    melted = (
        df.select(*keys, F.explode(pairs).alias("p"))
        .select(*keys, "p.col_name", "p.value")
        .filter(F.col("value").isNotNull())
    )
    return melted.groupBy(*keys, "col_name").agg(
        F.hll_sketch_agg("value", F.lit(lg_k)).alias("sketch")
    )


def update_ndv_sketches(
    wh,
    table: str,
    batch: DataFrame,
    cols: list[str],
    lg_k: int = 12,
    keys: list[str] | None = None,
) -> None:
    """Incremental NDV ledger: merge the batch's per-column HLL
    sketches into the persisted sketch table -- distinct-value
    profiling that never rescans the corpus (the 100 TB reason this
    exists: exact NDV shuffles the distinct set per refresh; this
    reads back ``n_cols`` binary rows and max-merges registers).
    Register-max merge is IDEMPOTENT: replaying the same batch is a
    semantic no-op on every estimate, so the ledger composes with
    at-least-once landing zones without a replay guard of its own.

    One transaction: the merged generation replaces the table
    atomically (``wh.overwrite`` is the crash-safe generation swap).
    ``keys`` must match the layout the table was seeded with (the
    merge groups on them).

    SINGLE-WRITER ownership: the read-merge-overwrite is atomic
    against readers but not against a CONCURRENT writer -- two
    streams merging into one ``<table>.ndv`` race on the generation
    swap and the loser's registers are dropped (last writer wins on
    the whole generation). Own one sketch table per writing stream
    (e.g. ``<table>.<stream>.ndv``) and union the frames at read time
    (``ndv_estimates`` accepts the union; register-max re-merge is
    idempotent) -- never share one sidecar between landing zones."""
    keys = keys or []
    new = ndv_sketch_rows(batch, cols, lg_k, keys=keys)
    if wh.exists(table):
        merged = (
            wh.read(table)
            .unionByName(new)
            .groupBy(*keys, "col_name")
            .agg(F.hll_union_agg("sketch", F.lit(True)).alias("sketch"))
        )
        # pin before overwrite: the plan reads the table it replaces
        merged = merged.localCheckpoint(eager=True)
        wh.overwrite(table, merged)
    else:
        wh.create_table(table, new.schema)
        wh.append(table, new)


def ndv_estimates(sketches: DataFrame) -> DataFrame:
    """(keys..., col_name, n_distinct BIGINT) from a sketch-table
    frame -- ``wh.read(table)`` output or ``ndv_sketch_rows``
    directly; any group-key columns pass through."""
    passthrough = [c for c in sketches.columns if c != "sketch"]
    return sketches.select(
        *passthrough,
        F.round(F.hll_sketch_estimate("sketch")).cast("bigint").alias(
            "n_distinct"
        ),
    )
