"""Binned range (interval) joins.

A time-range join with no equi key -- ``r.ts BETWEEN l.ts - w AND
l.ts`` -- is the one join shape Catalyst has no shuffle strategy for:
with nothing to hash on it plans a BroadcastNestedLoopJoin (or a
cartesian product), which is O(n*m) work and O(m) broadcast memory --
a non-starter at 100 TB. DuckDB solves this with its IEJoin operator;
Flink with interval joins over keyed state. The distributed-parity
trick (used by Flink's interval join and Spark's own session-window
machinery) is *binning*: quantize time into buckets at least as wide
as the probe interval, shuffle both sides on the bucket id, and each
left row can only match right rows in its own or the previous bucket.
The inequality becomes an equi-join on ``bin`` plus a cheap residual
filter -- one shuffle per side, whole-stage codegen, no broadcast of
anything.

Cost model: with bin width W >= interval length, each left row probes
exactly 2 bins, so the join input is 2x|left| + |right| rows shuffled
on a uniformly-distributed integer key -- the same scale shape as any
keyed aggregation. Skew only appears if the *data* concentrates in one
time bucket; the same salting/AQE levers as every keyed operator here
apply (add a salt to the bin key and replicate the right side).

Optional equi keys (``on``) compose: the shuffle key becomes
(keys..., bin), which both tightens the candidate set and spreads hot
bins across keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with ``l.left_ts + lower_s <= r.right_ts <=
    l.left_ts + upper_s`` (bounds inclusive, seconds; e.g. ``lower_s=
    -600, upper_s=0`` = "right events in the 10 minutes up to l").
    ``on`` adds equi-key conjuncts. ``how`` is ``inner`` or ``left``
    (left keeps unmatched left rows with NULL right columns).

    Column names must be disjoint between the two sides apart from
    ``on`` keys (select/alias first, as with any join). One shuffle
    per side on (on..., bin); never a nested-loop plan.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = on or []
    width = float(upper_s - lower_s)
    if width <= 0:
        raise ValueError("upper_s must be > lower_s")

    # Bin on epoch seconds as double: exact enough for coarse bucket
    # ids (the precise predicate below re-checks on the native
    # timestamp type, so bin-edge rounding can only cost a candidate,
    # never a wrong match -- and a candidate lost to rounding cannot
    # happen because the probe covers both straddled bins).
    r_bin = F.floor(F.col(right_ts).cast("double") / F.lit(width))
    lo = F.col(left_ts).cast("double") + F.lit(float(lower_s))
    hi = F.col(left_ts).cast("double") + F.lit(float(upper_s))
    probe_bins = F.sequence(
        F.floor(lo / F.lit(width)).cast("long"),
        F.floor(hi / F.lit(width)).cast("long"),
    )

    l = left.withColumn("__bin", F.explode(probe_bins))
    r = right.withColumn("__bin", r_bin.cast("long"))
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    joined = l.join(r, on=[*on, "__bin"], how="inner").filter(cond).drop("__bin")
    if how == "inner":
        return joined
    # left outer: matched pairs UNION unmatched-left with NULL right
    # columns (an anti-join on the same binned plan -- still no BNLJ).
    right_only = [c for c in right.columns if c not in on]
    matched_left = joined.select(*left.columns).distinct()
    unmatched = left.join(matched_left, on=list(left.columns), how="left_anti")
    nulls = unmatched.select(
        "*",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_only
        ],
    )
    return joined.unionByName(nulls)


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    aggs: list,
    on: list[str] | None = None,
) -> DataFrame:
    """Left-join range join collapsed to one row per left row:
    ``aggs`` are aggregate Columns over the matched right rows
    (COUNT/SUM over an empty match set follow SQL semantics: 0 / NULL).
    Grouping is by every left column, so left rows must be distinct.
    The aggregation reuses the join's (on..., bin) shuffle partitioning
    only partially -- Catalyst re-shuffles on the left key -- but both
    shuffles carry pair rows already filtered to the interval, not the
    raw cartesian."""
    on = on or []
    width = float(upper_s - lower_s)
    if width <= 0:
        raise ValueError("upper_s must be > lower_s")
    r_bin = F.floor(F.col(right_ts).cast("double") / F.lit(width))
    lo = F.col(left_ts).cast("double") + F.lit(float(lower_s))
    hi = F.col(left_ts).cast("double") + F.lit(float(upper_s))
    probe_bins = F.sequence(
        F.floor(lo / F.lit(width)).cast("long"),
        F.floor(hi / F.lit(width)).cast("long"),
    )
    l = left.withColumn("__bin", F.explode(probe_bins))
    r = right.withColumn("__bin", r_bin.cast("long"))
    # ONE left join on the bin key; out-of-interval candidates are
    # masked to NULL right columns instead of being re-derived via an
    # anti-join -- each exploded left copy survives the left join, the
    # groupBy merges the copies, and a right row matches at most one
    # bin so nothing double-counts. Plan: 1 join, 1 agg, 2 scans.
    valid = (
        F.col(right_ts).isNotNull()
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    right_only = [c for c in right.columns if c not in on]
    joined = l.join(r, on=[*on, "__bin"], how="left").select(
        *left.columns,
        *[
            F.when(valid, F.col(c)).alias(c)
            for c in right_only
        ],
    )
    return joined.groupBy(*left.columns).agg(*aggs)
