"""Parquet-backed warehouse: the Spark stand-in for Postgres heap tables.

The reference materializes everything as Postgres tables in the
``auto_dw`` schema (reference: utility/sql/info_tables.sql). Delta Lake
is not available in this environment, so the warehouse manages plain
parquet directories with three write modes that cover every sink the
reference uses (SURVEY.md S5-S9):

- ``append``      -> INSERT...SELECT sinks (S7). Hub/sat loads are made
                     idempotent *structurally* (anti-join before append,
                     reference: dv_loader.rs:177-181,339-346), so append
                     alone never duplicates.
- ``overwrite``   -> the SCD2 UPDATE sinks (S8). Metadata tables are
                     catalog-sized (rows = number of source columns), so
                     a full rewrite per merge is cheap and atomic enough
                     (write to temp dir + rename).
- ``create``      -> DDL sink (S6) with an explicit StructType.

Scale posture: data-plane tables (hubs/satellites) are written with
``partitionBy`` when a partition spec is registered -- at 100 TB you
partition by load date so incremental loads touch only new partitions
and never rewrite. Metadata tables stay tiny by construction.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Warehouse:
    """A directory of named parquet tables with a recorded schema."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._schemas: dict[str, T.StructType] = {}
        self._partitioning: dict[str, list[str]] = {}
        self._load_meta()

    # -- durable table metadata ------------------------------------------
    # Schemas and partition specs must survive the process: a fresh
    # session appending to a partitioned table without knowing its spec
    # would write unpartitioned files into it.
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_warehouse_meta.json")

    def _load_meta(self) -> None:
        import json

        if not os.path.isfile(self._meta_path()):
            return
        with open(self._meta_path()) as f:
            meta = json.load(f)
        for name, entry in meta.get("tables", {}).items():
            if entry.get("schema"):
                self._schemas[name] = T.StructType.fromJson(entry["schema"])
            if entry.get("partition_by"):
                self._partitioning[name] = list(entry["partition_by"])

    def _save_meta(self) -> None:
        import json

        tables = {}
        for name in set(self._schemas) | set(self._partitioning):
            tables[name] = {
                "schema": self._schemas[name].jsonValue() if name in self._schemas else None,
                "partition_by": self._partitioning.get(name),
            }
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"tables": tables}, f, indent=1, sort_keys=True)
        os.replace(tmp, self._meta_path())

    # -- paths ----------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.root, name.replace(".", "__"))

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and (
            any(f.startswith("part-") or f == "_SUCCESS" for f in os.listdir(p))
            or any(os.path.isdir(os.path.join(p, d)) for d in os.listdir(p))
        )

    # -- DDL (S6) -------------------------------------------------------
    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_by: list[str] | None = None,
        if_not_exists: bool = True,
    ) -> None:
        """CREATE TABLE: register schema and write an empty dataset."""
        if self.exists(name):
            if if_not_exists:
                self._schemas.setdefault(name, schema)
                if partition_by:
                    self._partitioning.setdefault(name, partition_by)
                self._save_meta()
                return
            raise ValueError(f"table {name} already exists")
        self._schemas[name] = schema
        if partition_by:
            self._partitioning[name] = partition_by
        self._save_meta()
        empty = self.spark.createDataFrame([], schema)
        writer = empty.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(name))

    def drop_table(self, name: str) -> None:
        if os.path.isdir(self.path(name)):
            shutil.rmtree(self.path(name))
        self._schemas.pop(name, None)
        self._partitioning.pop(name, None)
        self._save_meta()

    # -- reads ----------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        if name in self._schemas:
            return self.spark.read.schema(self._add_partition_fields(name)).parquet(
                self.path(name)
            )
        return self.spark.read.parquet(self.path(name))

    def _add_partition_fields(self, name: str) -> T.StructType:
        # partitionBy moves partition cols into directory names; supplying
        # the full schema keeps types stable even for an empty table.
        return self._schemas[name]

    # -- writes ---------------------------------------------------------
    def append(self, name: str, df: DataFrame) -> None:
        writer = df.write.mode("append")
        if name in self._partitioning:
            writer = writer.partitionBy(*self._partitioning[name])
        writer.parquet(self.path(name))

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Atomic-enough full rewrite: stage to a temp dir, then swap.

        A direct overwrite of the directory being read would corrupt the
        self-referential merges (read current -> compute -> rewrite), so
        we always stage.
        """
        staging = self.path(name) + ".staging-" + uuid.uuid4().hex[:8]
        writer = df.write.mode("overwrite")
        if name in self._partitioning:
            writer = writer.partitionBy(*self._partitioning[name])
        writer.parquet(staging)
        target = self.path(name)
        backup = target + ".old-" + uuid.uuid4().hex[:8]
        if os.path.isdir(target):
            os.rename(target, backup)
        os.rename(staging, target)
        if os.path.isdir(backup):
            shutil.rmtree(backup)
