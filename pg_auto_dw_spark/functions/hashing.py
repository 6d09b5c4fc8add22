"""Hash-key / hash-diff primitives (SURVEY.md F1/F2).

The reference defines one scalar UDF ``auto_dw.hash(text)`` = lowercase
hex SHA-256 (reference: extension/src/lib.rs:153-157) and concatenates
business-key parts with ``ARRAY_TO_STRING(ARRAY[a::TEXT, ...], ',')``
(reference: extension/src/controller/dv_loader.rs:170-172,331-336),
which skips NULLs.

Spark-first mapping -- NO Python UDF anywhere on this path:

- ``sha2(col, 256)`` is a JVM built-in producing the identical
  lowercase hex digest; it stays inside whole-stage codegen.
- ``concat_ws(',', ...)`` skips NULLs exactly like ARRAY_TO_STRING.

The only subtlety is *rendering*: Postgres ``value::TEXT`` output must
be reproduced byte-for-byte or hashes diverge. ``pg_text_expr`` maps
each Spark type to a rendering that matches both Postgres and the
DuckDB oracle (doubles go through DECIMAL so we never hit Spark's
scientific notation, e.g. 1.0E7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark simple-type-name -> how to render as PG-style ::TEXT.
_DECIMAL_RENDER = "decimal(38,2)"


def pg_text_expr(col: Column, spark_type: str) -> Column:
    """Render a column as text the way ``value::TEXT`` would in Postgres.

    For string/integer types a plain cast matches. Doubles are routed
    through a fixed-scale decimal: Spark's double->string cast emits
    scientific notation for abs(x) >= 1e7 while Postgres/DuckDB do not,
    so a direct cast would silently break hash parity.

    Double contract: engine-identical for values with <= 2 fractional
    decimal digits (the money-like columns hash-diffs render). Exact
    .xx5 ties at the 3rd decimal round differently across engines
    (Spark HALF_UP vs DuckDB's inconsistent tie behavior) -- property-
    tested boundary, see tests/test_properties.py. For full-precision
    doubles, hash the raw bit pattern instead of a decimal rendering.
    """
    t = spark_type.lower()
    if t in ("double", "float"):
        return col.cast(_DECIMAL_RENDER).cast("string")
    if t.startswith("decimal"):
        return col.cast("string")
    if t in ("timestamp", "timestamp_ntz"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return col.cast("string")


def hash_key(cols: list[Column] | list[str], types: list[str] | None = None) -> Column:
    """Business-key hash: sha256(concat_ws(',', parts...)) lowercase hex.

    Mirrors hub-load key hashing (reference: dv_loader.rs:170-172) where
    BK parts are rendered ::TEXT, comma-joined with NULLs skipped, then
    passed through auto_dw.hash (src/lib.rs:153-157).
    """
    rendered = []
    for i, c in enumerate(cols):
        c = F.col(c) if isinstance(c, str) else c
        typ = types[i] if types else "string"
        rendered.append(pg_text_expr(c, typ))
    return F.sha2(F.concat_ws(",", *rendered), 256)


def hash_diff(cols: list[Column] | list[str], types: list[str] | None = None) -> Column:
    """Satellite hash-diff over descriptor columns (dv_loader.rs:331-336).

    Same rendering/concat rules as hash_key; the reference uses one
    hash function for both roles.
    """
    return hash_key(cols, types)
