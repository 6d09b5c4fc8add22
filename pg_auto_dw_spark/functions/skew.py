"""Skew-safe exact aggregation: salting and two-phase distinct.

A groupBy on a low-cardinality or zipfian key funnels every row of a
hot group through one reducer task -- the classic straggler at 100 TB.
Spark's partial (map-side) aggregation already bounds the shuffle for
algebraic aggregates, and AQE can split skewed *joins*, but two shapes
still need explicit structure:

- ``salted_agg``: when the partial-agg hash table thrashes (huge
  per-task group churn) or the final shuffle must spread a handful of
  mega-groups across reducers, aggregate in two phases: (keys, salt)
  then keys. Exact for any algebraic aggregate (sum/count/min/max, and
  avg derived as sum/count at the end -- never avg-of-avgs).
- ``distinct_count_skewsafe``: exact COUNT(DISTINCT col) via
  dedup-on-(keys, col) then count. The heavy shuffle spreads over the
  *value* dimension, so a group with 10^9 distinct values fans out
  across the cluster instead of hitting one task. (This is the
  expansion Catalyst itself performs for one countDistinct; having it
  as an explicit operator composes with salting and documents the
  plan.)

Both are verified exact against plain-SQL oracles -- salting is a
physical rewrite, never a semantic one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (phase-1 partial, phase-2 merge) per algebraic aggregate
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: list[tuple[str, str, str]],
    n_salts: int = 32,
    avg_of: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Two-phase exact aggregation: ``metrics`` is [(fn, col, alias)]
    with fn in {sum, count, min, max}; ``avg_of`` adds exact averages
    as [(sum_alias, count_alias, alias)] computed sum/count AFTER the
    merge. The salt is a deterministic hash of the whole row's
    partition (spark_partition_id is NOT used -- pmod(hash) keeps the
    result independent of physical layout)."""
    for fn, _, _ in metrics:
        if fn not in _MERGE:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    salt = F.pmod(
        F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).alias("__salt")
    partial = df.select("*", salt).groupBy(*keys, "__salt").agg(
        *[
            _MERGE[fn][0](col).alias(f"__p_{alias}")
            for fn, col, alias in metrics
        ]
    )
    out = partial.groupBy(*keys).agg(
        *[
            _MERGE[fn][1](f"__p_{alias}").alias(alias)
            for fn, col, alias in metrics
        ]
    )
    for sum_alias, count_alias, alias in avg_of or []:
        out = out.withColumn(
            alias, F.col(sum_alias) / F.col(count_alias)
        )
    return out


def distinct_count_skewsafe(
    df: DataFrame,
    keys: list[str],
    col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT col): dedup on (keys, col) --
    the wide, well-spread shuffle -- then a count whose input is
    already collapsed to the distinct set."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(col).alias(alias))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: the fact side gets a deterministic salt
    in [0, n_salts) (hash of the whole row, so layout-independent) and
    the dim side is replicated once per salt value; the join runs on
    (on..., salt), spreading a hot key's rows over ``n_salts``
    reducers. Exact for inner/left joins -- each fact row still meets
    each matching dim row exactly once (dim rows are unique per salt).

    Use when the dim is too big to broadcast but small enough to
    replicate n_salts times through the shuffle, and AQE's skew-join
    split isn't available (it splits partitions, not single keys, and
    only for sort-merge). For broadcastable dims just broadcast() --
    no salt needed; for fact-fact skewed joins, isolate the hot keys
    (heavy_hitters) and union a broadcast plan for them."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    fact_s = fact.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, on=[*on, "__salt"], how=how).drop("__salt")


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float,
) -> DataFrame:
    """Exact frequent items: values of ``col`` holding at least
    ``min_share`` of all rows. One groupBy (count), then a broadcast
    scalar total -- the filter output is by construction at most
    1/min_share rows, so downstream consumers can broadcast it."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(min_share) * F.col("__total"))
        .select(col, "cnt", (F.col("cnt") / F.col("__total")).alias("share"))
    )


def skew_report(
    df: DataFrame,
    keys: list[str],
    parallelism: int | None = None,
    hot_share: float = 0.01,
) -> dict:
    """Pre-flight skew diagnosis for a planned groupBy/join on ``keys``:
    the advisor that tells an operator WHETHER to reach for the levers
    in this module (salted_agg / salted_join) and with what factor,
    before a hot key burns a stage.

    One count-by-key pass (map-side combined) reduced to bounded
    driver-side stats: total rows, distinct keys, the max key's share,
    and the keys above ``hot_share``. ``suggested_salt`` is the factor
    that splits the hottest key across the cluster: ceil(max_key_rows /
    ideal_rows_per_task), 1 when nothing is hot (salting has a cost --
    the advisor recommends it only when a single key exceeds one
    task's fair share). Everything returned is bounded by construction
    (at most 1/hot_share hot keys)."""
    import math

    parallelism = parallelism or df.sparkSession.sparkContext.defaultParallelism
    # pin the count-by-key result so the stats reduce and the hot-key
    # filter read it once -- without the pin each collect re-runs the
    # whole groupBy scan, the exact doubled pass this advisor exists
    # to flag
    counts = (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint()
    )
    stats = counts.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key"),
    ).collect()[0]
    total, n_keys, max_key = stats["total"] or 0, stats["n_keys"], stats["max_key"] or 0
    hot = (
        counts.filter(F.col("cnt") >= F.lit(float(hot_share * total)))
        .orderBy(F.col("cnt").desc(), *keys)
        .select(*keys, "cnt")
        .collect()
    )
    ideal = total / parallelism if parallelism else 0
    return {
        "total_rows": int(total),
        "n_keys": int(n_keys),
        "max_key_rows": int(max_key),
        "max_key_share": (max_key / total) if total else 0.0,
        "hot_keys": [tuple(r) for r in hot],
        "suggested_salt": int(math.ceil(max_key / ideal)) if ideal and max_key > ideal else 1,
    }
