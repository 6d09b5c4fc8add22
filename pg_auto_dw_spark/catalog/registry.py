"""Source registry: the Spark stand-in for pg_catalog's constraint and
comment metadata (SURVEY.md S2).

Spark has no pg_constraint / pg_description equivalents for parquet
tables, so PK/FK facts and descriptions live in this registry. The
crawler joins them onto schema introspection to produce the same
column-grain snapshot the reference builds from pg_namespace/pg_class/
pg_attribute/pg_type/pg_constraint/pg_description (reference:
extension/src/model/queries.rs:71-135).

OIDs don't exist either; we synthesize deterministic 31-bit ids from
names (stable across runs, which is all the SCD2 keys need).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field


def synthetic_oid(*names: str) -> int:
    """Deterministic positive 31-bit id for a qualified name."""
    return zlib.crc32(".".join(names).encode()) & 0x7FFFFFFF


@dataclass
class TableMeta:
    schema_name: str
    table_name: str
    description: str | None = None
    pk_columns: tuple[str, ...] = ()
    pk_name: str | None = None  # defaults to <table>_pkey like Postgres
    fk_columns: tuple[str, ...] = ()
    column_descriptions: dict[str, str] = field(default_factory=dict)

    def effective_pk_name(self) -> str | None:
        if not self.pk_columns:
            return None
        return self.pk_name or f"{self.table_name}_pkey"


class SourceRegistry:
    """Metadata registry keyed by (schema, table)."""

    def __init__(self, tables: list[TableMeta] | None = None):
        self._tables: dict[tuple[str, str], TableMeta] = {}
        # schema-level descriptions (pg_description on the namespace)
        self.schema_descriptions: dict[str, str] = {}
        for t in tables or []:
            self.register(t)

    def register(self, meta: TableMeta) -> None:
        self._tables[(meta.schema_name, meta.table_name)] = meta

    def get(self, schema_name: str, table_name: str) -> TableMeta:
        return self._tables.get(
            (schema_name, table_name), TableMeta(schema_name, table_name)
        )


def testdata_registry(schema_name: str = "main") -> SourceRegistry:
    """PK/FK facts for the driver's TPC-H-ish tables (TESTDATA.md)."""
    t = TableMeta
    return SourceRegistry(
        [
            t(schema_name, "region", pk_columns=("r_regionkey",)),
            t(schema_name, "nation", pk_columns=("n_nationkey",), fk_columns=("n_regionkey",)),
            t(schema_name, "customer", pk_columns=("c_custkey",), fk_columns=("c_nationkey",)),
            t(schema_name, "supplier", pk_columns=("s_suppkey",), fk_columns=("s_nationkey",)),
            t(schema_name, "part", pk_columns=("p_partkey",)),
            t(schema_name, "orders", pk_columns=("o_orderkey",), fk_columns=("o_custkey",)),
            t(
                schema_name,
                "lineitem",
                pk_columns=("l_orderkey", "l_linenumber"),
                fk_columns=("l_orderkey", "l_partkey", "l_suppkey"),
            ),
            t(schema_name, "events", pk_columns=("event_id",)),
            t(schema_name, "documents", pk_columns=("doc_id",)),
            t(schema_name, "embeddings", pk_columns=("vec_id",)),
        ]
    )
