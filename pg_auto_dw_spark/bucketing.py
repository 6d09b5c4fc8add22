"""Bucketed tables: shuffle-free co-located joins and aggregations.

The reference gets join locality for free -- Postgres has indexes and
a single node (controller/dv_builder.rs joins hub/sat/link in one SPI
query). On a 1000-executor cluster the analog is *bucketing*: write a
table hash-partitioned into N buckets on its join key, sorted within
buckets, and every future equi-join or groupBy on that key reads
co-located, pre-sorted buckets -- Catalyst drops BOTH the shuffle and
the sort from the plan. For the DV load paths this is the difference
between every incremental hub/sat/link load re-shuffling the full
vault on hash keys and a shuffle-free sort-merge against pre-bucketed
vault tables; at 100 TB the vault-side shuffle IS the load cost.

Bucketing is a Spark-catalog feature (the bucket spec lives in the
table metadata, the files carry the bucket id in their names), so
these helpers go through ``saveAsTable`` with an explicit ``path`` --
external tables: the data lives where the caller says, the catalog
entry is just the bucketed-layout contract. Choose the bucket count
once per table family: joins only elide the shuffle when both sides
bucket on the join key and the counts are equal or integer multiples
(Spark reads the larger as a union of the smaller's buckets).

Rule of thumb at 100 TB: buckets ~= total_size / 256 MB, rounded to a
power of two, same count for hub+sat+link of one ensemble.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as an external parquet table bucketed (and
    by default sorted) on ``bucket_cols``. Joins/aggregations on the
    bucket columns against same-bucketed tables run shuffle-free."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables; when both are bucketed on ``on`` with
    compatible counts, the physical plan contains zero Exchange
    operators (assert via ``assert_no_shuffle``)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan re-partitions anything -- the
    contract a bucketed layout exists to guarantee."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"plan contains a shuffle:\n{plan}")
