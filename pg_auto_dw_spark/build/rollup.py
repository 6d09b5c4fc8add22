"""Incremental aggregate maintenance (materialized rollup refresh).

The reference's warehouse is write-side only; any serious deployment
also maintains rollups (daily per-type totals, per-user counters) that
must NOT be recomputed from 100 TB of history on every new batch. The
standard incremental-view-maintenance trick for algebraic aggregates:
store the rollup in *partial* space (sum/count/min/max columns --
mergeable), and on a new batch (1) partially aggregate just the batch,
(2) read back ONLY the rollup partitions the batch touches
(partition-pruned scan of the small rollup, never the source), (3)
merge old partials with batch partials, (4) dynamic-partition
overwrite the touched partitions. Cost per batch is O(batch + touched
rollup slice), independent of history size.

Mergeability is the same property `functions/skew.salted_agg` exploits
(its _MERGE table is reused here); non-algebraic aggregates (median,
distinct) need sketches (functions/sketch.py) or an exact recompute of
touched partitions from the source.

Batches must be applied exactly once (merging is additive for
sum/count). Under Structured Streaming, foreachBatch + checkpoint
provides exactly that -- the same contract as scd2_dim_stream
(streaming/jobs.py); for ad-hoc replays, dedup batches upstream
(e.g. events_stream_dedup) or rebuild with init().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.skew import _MERGE
from ..warehouse import Warehouse


class IncrementalRollup:
    """An algebraic rollup over ``key_cols`` (which must include
    ``partition_col``, the refresh grain -- typically a day column),
    maintained in a Warehouse table in partial space.

    ``metrics`` is [(fn, source_col, alias)] with fn in {sum, count,
    min, max}. ``read()`` returns final space (plus derived averages
    via ``avg_of`` = [(sum_alias, count_alias, alias)]).
    """

    def __init__(
        self,
        wh: Warehouse,
        name: str,
        key_cols: list[str],
        partition_col: str,
        metrics: list[tuple[str, str, str]],
        avg_of: list[tuple[str, str, str]] | None = None,
    ) -> None:
        if partition_col not in key_cols:
            raise ValueError("partition_col must be one of key_cols")
        for fn, _, _ in metrics:
            if fn not in _MERGE:
                raise ValueError(f"non-algebraic aggregate {fn!r}")
        self.wh = wh
        self.name = name
        self.key_cols = key_cols
        self.partition_col = partition_col
        self.metrics = metrics
        self.avg_of = avg_of or []

    def _partial(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.key_cols).agg(
            *[
                _MERGE[fn][0](col).alias(alias)
                for fn, col, alias in self.metrics
            ]
        )

    def _merge_partials(self, parts: DataFrame) -> DataFrame:
        return parts.groupBy(*self.key_cols).agg(
            *[
                _MERGE[fn][1](alias).alias(alias)
                for fn, _, alias in self.metrics
            ]
        )

    def init(self, df: DataFrame) -> None:
        """(Re)build the rollup from a full source frame."""
        partial = self._partial(df)
        if not self.wh.exists(self.name):
            self.wh.create_table(
                self.name,
                T.StructType(partial.schema.fields),
                partition_by=[self.partition_col],
            )
        self.wh.overwrite(self.name, partial)

    def apply_batch(self, batch: DataFrame) -> None:
        """Fold one new batch in: touch only the partitions the batch
        lands in. The batch partials are pinned (localCheckpoint) so
        the touched-partition list and the merge read one computation."""
        partial = self._partial(batch).localCheckpoint(eager=True)
        touched = [
            r[0] for r in partial.select(self.partition_col).distinct().collect()
        ]
        if not touched:
            return
        old = self.wh.read(self.name).filter(
            F.col(self.partition_col).isin(touched)
        )
        merged = self._merge_partials(partial.unionByName(old))
        self.wh.overwrite_partitions(self.name, merged)

    def read(self) -> DataFrame:
        """Final-space view: partial columns plus derived averages."""
        df = self.wh.read(self.name)
        for sum_alias, count_alias, alias in self.avg_of:
            df = df.withColumn(alias, F.col(sum_alias) / F.col(count_alias))
        return df
