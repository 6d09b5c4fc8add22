"""Z-order (Morton) clustering for multi-column data skipping.

Parquet scans prune row groups / files via min-max stats. Sorting by
one column makes ITS stats tight and every other column's useless; at
100 TB the common case is two or three filter dimensions (user AND
time; key AND load date). Z-ordering interleaves the bits of the
normalized dimensions into one sort key, so a range-partitioned write
produces files whose min-max boxes are tight in EVERY interleaved
dimension -- Delta OPTIMIZE ZORDER BY / Iceberg sort-order do exactly
this; here it is a pure-expression column (shift/mask/or built-ins,
whole-stage codegen, zero Python, zero extra shuffles beyond the
range partition the write needs anyway).

Normalization maps each column to an integer in [0, 2^bits) via its
global min/max (one tiny stats aggregation, collected driver-side --
two scalar literals per column in the plan). Rank-based normalization
(percent_rank) would resist outliers but costs a global sort per
column; min-max is the standard trade and what the table formats use
(on their file stats).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(normed: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``normed`` integer columns (each already in
    [0, 2^bits)) into one long: bit i of column j lands at position
    i * len(normed) + j."""
    n = len(normed)
    parts = []
    for j, col in enumerate(normed):
        c = col.cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return functools.reduce(lambda a, b: a.bitwiseOR(b), parts)


def zvalue(
    df: DataFrame, cols: list[str], bits: int = 16
) -> Column:
    """Z-value expression for ``cols`` (numeric or timestamp) over
    ``df``'s current min/max ranges. Constant columns normalize to 0.
    bits * len(cols) must fit a signed long (<= 62)."""
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    normed = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else None
        v = F.col(c).cast("double")
        if span is None:
            normed.append(F.lit(0))
        else:
            normed.append(
                F.least(
                    F.lit(top),
                    F.floor((v - F.lit(mn)) / F.lit(span) * F.lit(top + 1)).cast("long"),
                )
            )
    return interleave_bits(normed, bits)


def zorder_frame(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Range-partition ``df`` on its z-value into ``n_files`` chunks
    and sort within each -- written out, every file covers a compact
    z-range, i.e. a tight min-max box in every clustered dimension."""
    z = zvalue(df, cols, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
