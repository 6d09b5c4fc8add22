"""Distributed contiguous sequence assignment.

The reference hands out surrogate primary keys from Postgres sequences
(``auto_dw.build_call``/``source_objects`` serial pks,
utility/sql/info_tables.sql). The naive Spark translation is
``row_number() OVER (ORDER BY ...)`` with no partitioning -- WindowExec
then moves the whole input to ONE partition, which is exactly the shape
that dies at scale (and Spark warns about it on every run).

``global_row_number`` produces the same contiguous 1-based numbering in
three scale-safe steps:

1. range-repartition on the order key (partition i holds keys sorting
   before partition j for i < j -- RangePartitioner's contract);
2. per-partition ``row_number`` windows (narrow, parallel);
3. per-partition row counts -> cumulative offsets. The counts are one
   row per partition (bounded by cluster parallelism, NOT data size),
   so computing offsets driver-side is the same O(partitions) step
   ``RDD.zipWithIndex`` performs internally.

The order key must be unique per row (true for every caller: catalog
pk-assignment orders by schema/table/ordinal). Ties would make the
numbering partition-dependent, same as any engine's ROW_NUMBER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "__rn"
) -> DataFrame:
    """Add ``out_col`` = contiguous 1-based global row number in
    ``order_cols`` order, without a single-partition window."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    # Materialize the partition id in the range-partitioned stage, then
    # PIN the result: the counts job and the final plan must read the
    # exact same partitioning (a re-planned range shuffle samples new
    # bounds -- rows could move between pids and corrupt the offsets).
    # localCheckpoint stores the computed blocks once; both downstream
    # jobs read them. eager=False: the counts job below is the first
    # action, so it doubles as the materialization pass (one fewer job).
    # Executor-storage durability is fine here: every caller feeds
    # catalog-metadata-sized frames.
    pinned = part.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=False)
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    local = pinned.withColumn("__lrn", F.row_number().over(w))
    # O(partitions) rows -- the legitimate driver-side step (same step
    # RDD.zipWithIndex runs internally).
    counts = sorted(
        (r["__pid"], r["count"]) for r in pinned.groupBy("__pid").count().collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long")).limit(0)
    # Offsets as a literal pid->offset map: pure expression, no join, no
    # extra exchange. Bounded by parallelism (one entry per partition).
    off_map = F.create_map(
        *[F.lit(v) for pid_off in offsets for v in pid_off]
    )
    return local.withColumn(
        out_col,
        (F.col("__lrn") + F.element_at(off_map, F.col("__pid"))).cast("long"),
    ).drop("__pid", "__lrn")
