"""Deterministic corpus sharding: the global-shuffle-then-write step
that turns a prepared corpus into training shards.

Every pretraining pipeline ends with exactly one sanctioned full
shuffle: spread documents pseudo-randomly across N shard files so any
prefix of any shard is an unbiased sample, with a seed so epoch 2 is a
DIFFERENT deterministic order (cheap epoch reshuffling: re-run with
seed+1, no RNG state to persist -- the md5 integer construction shared
with the selection/minhash oracles makes the plan reproducible
bit-for-bit on any cluster and any partitioning).

Scale shape: assignment is a map-only expression; the write is ONE
repartition on the shard id followed by a WITHIN-partition sort on the
order key (``sortWithinPartitions`` -- local disk sort, spill-safe,
never a global range sort), so the operator costs exactly one shuffle
of the corpus, which is the floor for a global shuffle. No window over
a shard (a per-shard window would put a whole shard in one in-memory
partition); order materializes in file row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shuffle_key(id_col: str, seed: int):
    """32-bit md5-prefix integer of (seed, id) -- the deterministic
    pseudo-random order key."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")


def shard_assignments(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` plus (shard, shuffle_key): shard = key mod n_shards,
    shuffle_key the within-shard order. Pure map -- callers that only
    need the PLAN (e.g. an oracle or an audit) stop here; the write
    path below adds the one shuffle."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = _shuffle_key(id_col, seed)
    return docs.withColumn("shuffle_key", key).withColumn(
        "shard", (F.col("shuffle_key") % n_shards).cast("bigint")
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Materialize the epoch: one shard directory per shard id, rows in
    shuffle_key order within each shard (parquet preserves writer row
    order, so a sequential reader of a shard streams the deterministic
    pseudo-random order with zero read-time work)."""
    assigned = shard_assignments(docs, n_shards, seed, id_col)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """One shard back, in its written order (file row order; single
    shard dirs are written by a single task so order is total). Reads
    the parent with a partition filter -- pruning touches only that
    shard's directory, and a shard that received zero rows (possible
    whenever n_shards approaches the corpus size) returns an EMPTY
    frame instead of a path-not-found error."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)


def write_curriculum_shards(
    docs,
    path: str,
    n_shards: int,
    order_col: str,
    seed: int = 0,
    id_col: str = "doc_id",
    ascending: bool = False,
) -> None:
    """Curriculum epoch writer: identical one-shuffle shard assignment
    as ``write_training_shards``, but rows within each shard order by
    ``order_col`` FIRST (descending by default: highest
    quality/difficulty score leads the shard) with the deterministic
    shuffle key breaking ties -- a sequential reader of any shard
    streams the curriculum order with zero read-time work, and every
    shard sees the same score mix (assignment stays pseudo-random, so
    prefix-of-epoch remains an unbiased sample of SCORES even though
    it is ordered within shards). Same cost floor: exactly one corpus
    shuffle plus within-partition sort; never a global range sort."""
    assigned = shard_assignments(docs, n_shards, seed, id_col)
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(
            F.col("shard").asc(), order, F.col("shuffle_key").asc(), F.col(id_col).asc()
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
