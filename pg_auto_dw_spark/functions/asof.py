"""As-of joins and Data Vault point-in-time (PIT) tables.

The reference automates a raw Data Vault; the standard query
accelerator over one is the PIT table -- for each (business key,
snapshot instant), the latest satellite version applied at or before
that instant (Linstedt DV 2.0 practice; the reference's satellites
carry exactly the ``load_ts`` this keys on, dv_loader.rs:339-346).
The primitive under a PIT build is the as-of join, which Spark has no
native operator for.

Spark-first shape: an as-of join expressed as a range join
(``l.key = r.key AND r.ts <= l.ts`` + argmax) degenerates in Catalyst
to a broadcast-nested-loop or an exploded inequality join -- O(n*m)
at 100 TB. Instead both sides UNION into one narrow frame and the
last right-side payload is carried forward per key with ONE window
pass over (key, ts): one shuffle on the key, a local sort per
partition, zero joins. This is the textbook "last observation carried
forward" plan, and it scales exactly like sessionization (same
shuffle key, same window machinery).

Skew note: the window partitions on the join key; a pathologically
hot key concentrates its rows in one task like any keyed operator
here -- the same salting/AQE-skew levers apply. Payload width is one
struct column, so the carried state is small regardless of how many
value columns ride along.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the payload of the LATEST right row
    of the same key with ``right_ts <= left_ts`` (inclusive, DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics); left rows with no
    prior right row keep NULL payload (left-join semantics).

    ``payload`` defaults to every right column outside the key; each
    lands as ``<name><suffix>`` plus ``<right_ts><suffix>`` for the
    matched version's own timestamp. Right rows must be unique per
    (key, right_ts) -- pre-aggregate otherwise (a duplicate instant
    has no deterministic 'latest').
    """
    payload = payload or [c for c in right.columns if c not in on and c != right_ts]
    pay_cols = [right_ts, *payload]
    pay_struct = F.struct(*[F.col(c) for c in pay_cols])
    pay_type = right.select(pay_struct.alias("__pay")).schema["__pay"].dataType

    left_extra = [c for c in left.columns if c not in on]
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        pay_struct.alias("__pay"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_extra
        ],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(pay_type).alias("__pay"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_extra],
    )
    # right rows sort BEFORE probe rows at an equal timestamp, making
    # the carry inclusive (<=); the window never looks past the row
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = r.unionByName(l).withColumn(
        "__pay", F.last("__pay", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in on],
        *[F.col(c) for c in left_extra],
        F.col("__pay")[right_ts].alias(f"{right_ts}{suffix}"),
        *[F.col("__pay")[c].alias(f"{c}{suffix}") for c in payload],
    )


def pit_snapshot(
    versions: DataFrame,
    snapshots: list[datetime.datetime],
    on: list[str],
    ts_col: str = "load_ts",
    payload: list[str] | None = None,
) -> DataFrame:
    """Point-in-time table: for each (key, snapshot date) the latest
    version applied at or before the snapshot (keys with no version
    yet carry NULLs -- visible 'not yet loaded' rows, standard PIT
    form). Output grain: |distinct keys| x |snapshots|.

    The probe frame is the key set cross-joined with the (tiny,
    broadcast) snapshot list; the as-of resolution is the one-shuffle
    union+carry-forward plan above -- never a range join. At 100 TB
    the snapshot list is dates (tens), so the probe frame is ~|keys| x
    tens of rows: the PIT table's own size, which is the point of
    materializing it."""
    dates = F.array(*[F.lit(s).cast("timestamp") for s in sorted(snapshots)])
    probes = (
        versions.select(*on)
        .distinct()
        .select(*on, F.explode(dates).alias("snapshot_ts"))
    )
    return asof_join(
        probes,
        versions,
        on=on,
        left_ts="snapshot_ts",
        right_ts=ts_col,
        payload=payload,
        suffix="",
    )
