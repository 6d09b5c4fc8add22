"""Distributed contiguous sequence assignment.

The reference hands out surrogate primary keys from Postgres sequences
(``auto_dw.build_call``/``source_objects`` serial pks,
utility/sql/info_tables.sql). The naive Spark translation is
``row_number() OVER (ORDER BY ...)`` with no partitioning -- WindowExec
then moves the whole input to ONE partition, which is exactly the shape
that dies at scale (and Spark warns about it on every run).

``global_row_number`` produces contiguous 1-based numbering adaptively:

- The input is pinned once (``localCheckpoint``) and sized with a
  single count job -- the upstream plan (typically an anti-join against
  the warehouse) runs exactly once no matter which path follows.
- **Small inputs** (metadata-sized, the common case for catalog and
  build-call pk assignment) take a single-partition window over the
  pinned blocks: zero additional jobs, and the single partition is safe
  *by measurement*, not by hope.
- **Large inputs** range-repartition on the order key (partition i
  holds keys sorting before partition j for i < j -- RangePartitioner's
  contract), number within partitions in parallel, and add per-partition
  offsets computed from one O(partitions)-row count pass -- the same
  step ``RDD.zipWithIndex`` performs internally.

The order key must be unique per row (true for every caller: catalog
pk-assignment orders by schema/table/ordinal). Ties would make the
numbering partition-dependent, same as any engine's ROW_NUMBER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Above this many rows the single-partition window would concentrate a
# non-trivial sort on one core; switch to the range-partitioned path.
SINGLE_PARTITION_MAX = 2_000_000


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "__rn",
    single_partition_max: int = SINGLE_PARTITION_MAX,
    n_rows: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = contiguous 1-based global row number in
    ``order_cols`` order, without an unmeasured single-partition window.

    ``n_rows`` lets a caller that already counted (and pinned) the
    input skip the sizing job -- e.g. the SCD2 merge counts its insert
    set for the audit anyway."""
    spark = df.sparkSession
    if n_rows is not None:
        pinned, total = df, n_rows
    else:
        # Pin the input: the size probe below materializes the blocks
        # once, and whichever numbering path follows re-reads those
        # exact blocks (the upstream plan -- typically a join -- never
        # runs twice).
        pinned = df.localCheckpoint(eager=False)
        total = pinned.count()
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("long")).limit(0)
    if total <= single_partition_max:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return pinned.coalesce(1).withColumn(
            out_col, F.row_number().over(w).cast("long")
        )
    n = spark.sparkContext.defaultParallelism
    part = pinned.repartitionByRange(n, *[F.col(c) for c in order_cols])
    # Materialize the partition id in the range-partitioned stage, then
    # PIN the result: the counts job and the final plan must read the
    # exact same partitioning (a re-planned range shuffle samples new
    # bounds -- rows could move between pids and corrupt the offsets).
    # Executor-storage durability is fine here: a lost block fails the
    # job visibly rather than corrupting the numbering.
    ranged = part.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    local = ranged.withColumn("__lrn", F.row_number().over(w))
    # O(partitions) rows -- the legitimate driver-side step (same step
    # RDD.zipWithIndex runs internally).
    counts = sorted(
        (r["__pid"], r["count"]) for r in ranged.groupBy("__pid").count().collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    # Offsets as a literal pid->offset map: pure expression, no join, no
    # extra exchange. Bounded by parallelism (one entry per partition).
    off_map = F.create_map(*[F.lit(v) for pid_off in offsets for v in pid_off])
    return local.withColumn(
        out_col,
        (F.col("__lrn") + F.element_at(off_map, F.col("__pid"))).cast("long"),
    ).drop("__pid", "__lrn")
