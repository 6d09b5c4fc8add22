"""SCD2 merge of catalog snapshots into ``auto_dw.source_objects``
(SURVEY.md section 3.2; reference: extension/src/model/queries.rs:65-321).

The reference runs one SQL script per crawl: build temp snapshot,
UNION/EXCEPT include-exclude filtering, then four sequential DML
statements. We compute the same final state in one DataFrame pass:

1. mark deleted   (current row, key absent from snapshot)     J8/S8
2. close changed  (key present, any tracked col IS DISTINCT)  P6/S8
3. resurrect      (deleted row reappears, OR-equality chain)  P7/S8
4. insert new     (snapshot key with no surviving current row) J5/S7

Sequential-update equivalence argument: (1) and (2)/(3) are disjoint
(deletion requires no key match; change/resurrect require a match);
(3) only touches rows not closed by (2) (closing clears current_flag,
and the reference's update runs after the close); (4) inserts exactly
the snapshot keys whose current row was closed or never existed. So a
single joined pass with those predicates lands in the identical state.

Scale: the catalog table is column-grain metadata (tiny); every join
broadcasts under AQE. The same merge shape applied to a data-scale
SCD2 dimension would want the target bucketed by key -- noted in the
loaders, not needed here.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .introspect import SNAPSHOT_SCHEMA
from ..warehouse import Warehouse

TABLE = "auto_dw.source_objects"
KEYS = ["schema_oid", "table_oid", "column_ordinal_position"]

# The 12 change-tracked columns (queries.rs:240-253).
TRACKED = [
    "schema_name",
    "schema_description",
    "table_name",
    "table_description",
    "column_name",
    "column_base_type_name",
    "column_modification_number",
    "column_type_name",
    "column_description",
    "column_pk_ind",
    "column_pk_name",
    "column_fk_ind",
]

SOURCE_OBJECTS_SCHEMA = T.StructType(
    [T.StructField("pk_source_objects", T.LongType(), False)]
    + SNAPSHOT_SCHEMA.fields
    + [
        T.StructField("column_dw_flag", T.StringType(), False),
        T.StructField("valid_from", T.TimestampType(), True),
        T.StructField("valid_to", T.TimestampType(), True),
        T.StructField("current_flag", T.StringType(), False),
        T.StructField("deleted_flag", T.StringType(), False),
    ]
)


def ensure_table(wh: Warehouse) -> None:
    wh.create_table(TABLE, SOURCE_OBJECTS_SCHEMA)


def filter_snapshot(
    current: DataFrame,
    snapshot: DataFrame,
    include: tuple[str, str, str],
    exclude: tuple[str, str, str],
) -> DataFrame:
    """Include/exclude regex keyed-list semantics (queries.rs:164-194):

    keep = (keys currently tracked  UNION  keys matching include)
           EXCEPT keys matching exclude

    UNION and EXCEPT deduplicate in Postgres (SURVEY O3/O4), hence
    ``distinct``/``subtract`` here. The 'a^' sentinel matches nothing.
    """
    cur_keys = (
        current.filter((F.col("current_flag") == "Y") & (F.col("deleted_flag") == "N"))
        .select(*KEYS)
    )
    inc = snapshot.filter(
        F.col("schema_name").rlike(include[0])
        & F.col("table_name").rlike(include[1])
        & F.col("column_name").rlike(include[2])
    ).select(*KEYS)
    exc = snapshot.filter(
        F.col("schema_name").rlike(exclude[0])
        & F.col("table_name").rlike(exclude[1])
        & F.col("column_name").rlike(exclude[2])
    ).select(*KEYS)
    keep = cur_keys.union(inc).distinct().subtract(exc)
    return snapshot.join(keep, on=KEYS, how="inner")


def merge_snapshot(
    wh: Warehouse,
    snapshot: DataFrame,
    as_of: datetime.datetime | None = None,
    audit: bool = True,
) -> dict[str, int]:
    """Run the 4-step SCD2 merge; returns row counts per action
    (``audit=False`` skips the counting jobs -- the merge itself is one
    write either way)."""
    ensure_table(wh)
    # Postgres-transaction parity: the whole read-compute-write cycle
    # holds the table lock, so two concurrent merges serialize instead
    # of losing an update (reference: dv_loader.rs:59-64 runs the full
    # script in one SPI transaction).
    with wh.lock(TABLE):
        now = F.lit(as_of).cast("timestamp") if as_of else F.current_timestamp()
        cur = wh.read(TABLE)
        cur_y = cur.filter(F.col("current_flag") == "Y")
        cur_n = cur.filter(F.col("current_flag") != "Y")

        snap = snapshot.select(
            *[F.col(c).alias(f"snap_{c}") for c in snapshot.columns], F.lit(1).alias("snap_match")
        )
        # With audit the join feeds three consumers (audit aggregate, insert
        # anti-join, final write) -- pin it so it computes once. Without
        # audit there are only two consumers of this metadata-grain join and
        # the checkpoint's materialization cost exceeds the recompute
        # (measured: scd2_merge_state 4.96s pinned vs ~3.2s not, sf0.1).
        j = cur_y.join(
            snap,
            on=[F.col(k) == F.col(f"snap_{k}") for k in KEYS],
            how="left",
        )
        if audit:
            j = j.localCheckpoint(eager=False)

        matched = F.col("snap_match").isNotNull()
        # any tracked column IS DISTINCT FROM its snapshot value (P6)
        changed_pred = F.lit(False)
        for c in TRACKED:
            changed_pred = changed_pred | ~F.col(c).eqNullSafe(F.col(f"snap_{c}"))
        changed = matched & changed_pred
        # resurrect: deleted row reappears with any plainly-equal column (P7;
        # null-unsafe equality chain as in queries.rs:263-276)
        equal_pred = F.lit(False)
        for c in TRACKED:
            equal_pred = equal_pred | (F.col(c) == F.col(f"snap_{c}"))
        resurrect = matched & ~changed & (F.col("deleted_flag") == "Y") & equal_pred

        updated_y = j.select(
            *[
                F.col(c)
                for c in cur.columns
                if c not in ("deleted_flag", "current_flag", "valid_to")
            ],
            F.when(~matched, F.lit("Y"))
            .when(resurrect, F.lit("N"))
            .otherwise(F.col("deleted_flag"))
            .alias("deleted_flag"),
            F.when(changed, F.lit("N")).otherwise(F.col("current_flag")).alias("current_flag"),
            F.when(changed, now).otherwise(F.col("valid_to")).alias("valid_to"),
        ).select(*cur.columns)

        # insert: snapshot keys whose current row was closed or never existed
        surviving_keys = j.filter(~changed).select(*KEYS)
        # Counted once: the count sizes the sequence window AND supplies the
        # audit's "inserted" figure -- no second job. Pinning only pays when
        # the audit aggregate adds a third consumer of the same lineage.
        inserts_src = snapshot.join(surviving_keys, on=KEYS, how="left_anti")
        if audit:
            inserts_src = inserts_src.localCheckpoint(eager=False)
        n_inserts = inserts_src.count()

        # max existing pk attached via a broadcast scalar cross join instead
        # of a driver collect -- keeps the merge a single job at write time
        max_pk_df = cur.agg(
            F.coalesce(F.max("pk_source_objects"), F.lit(0)).alias("__max_pk")
        )
        from ..functions.sequence import global_row_number

        # contiguous pk sequence without a single-partition window
        # (Postgres-sequence analog, utility/sql/info_tables.sql)
        inserts = (
            global_row_number(
                inserts_src,
                ["schema_name", "table_name", "column_ordinal_position"],
                "__rn",
                n_rows=n_inserts,
            )
            .crossJoin(F.broadcast(max_pk_df))
            .withColumn("pk_source_objects", F.col("__rn") + F.col("__max_pk"))
            .drop("__max_pk", "__rn")
            .withColumn("column_dw_flag", F.lit("N"))
            .withColumn("valid_from", now)
            .withColumn("valid_to", F.lit(None).cast("timestamp"))
            .withColumn("current_flag", F.lit("Y"))
            .withColumn("deleted_flag", F.lit("N"))
            .select(*cur.columns)
        )

        counts = {"deleted": 0, "closed": 0, "resurrected": 0, "inserted": n_inserts}
        if audit:
            # One aggregation pass for the audit counts (four separate
            # count() jobs would re-run the join each time).
            stats = j.agg(
                F.sum((~matched & (F.col("deleted_flag") == "N")).cast("int")).alias("deleted"),
                F.sum(changed.cast("int")).alias("closed"),
                F.sum(resurrect.cast("int")).alias("resurrected"),
            ).collect()[0]
            counts = {
                "deleted": stats["deleted"] or 0,
                "closed": stats["closed"] or 0,
                "resurrected": stats["resurrected"] or 0,
                "inserted": n_inserts,
            }
        final = cur_n.unionByName(updated_y).unionByName(inserts)
        wh.overwrite(TABLE, final)
        return counts


def crawl(
    wh: Warehouse,
    snapshot: DataFrame,
    include: tuple[str, str, str] = ("a^", "a^", "a^"),
    exclude: tuple[str, str, str] = ("a^", "a^", "a^"),
    as_of: datetime.datetime | None = None,
) -> dict[str, int]:
    """One crawler iteration (reference: bgw_source_objects.rs:18-51):
    filter the snapshot by the include/exclude key-list semantics, then
    merge. Default patterns track only already-included keys, exactly
    like the background worker's 'a^' x6 call."""
    ensure_table(wh)
    filtered = filter_snapshot(wh.read(TABLE), snapshot, include, exclude)
    return merge_snapshot(wh, filtered, as_of=as_of)
