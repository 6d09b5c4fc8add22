"""Source-table column profiling: the data-shape statistics an
automated warehouse builder gathers alongside the catalog crawl
(SURVEY S2 context; the reference carries only catalog metadata into
its prompts -- queries.rs:71-135, prompt_template.rs detail lines --
and per-column profiles are the natural data-side enrichment for the
same classification flow).

Scale shape: ONE aggregation pass over the table computes every
column's stats (count/nulls/distinct/min/max) -- map-side combined,
one exchange carrying a single row -- then a plan-level unpivot
(``stack``) turns that row into one row per column. No per-column
scans, no Python.

Caveat at 100 TB: exact COUNT(DISTINCT) over many columns expands the
aggregate (one pass per distinct-set internally); swap
``exact_distinct=False`` to use ``approx_count_distinct`` (HLL, one
pass total) when profiling wide tables at full scale -- kept exact by
default because the DuckDB oracle must hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render(col, dtype) -> F.Column:
    """Engine-portable string rendering for min/max values: doubles go
    through DECIMAL(38,2) (Spark's double->string uses scientific
    notation where DuckDB's doesn't -- the hashing.py convention);
    everything else casts directly."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.cast("decimal(38,2)").cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    for each profiled column, computed in one aggregation pass."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(schema)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c)) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct.alias(f"__nd_{c}"),
            _render(F.min(F.col(c)), schema[c]).alias(f"__min_{c}"),
            _render(F.max(F.col(c)), schema[c]).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, __nn, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        F.col("__n_rows").alias("n_rows"),
        (F.col("__n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def pii_scan(
    df: DataFrame,
    columns: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Data-side PII bait detection: for every string column x PII
    pattern, the number of rows whose VALUE matches -- the check that
    catches sensitive data hiding in innocently-named columns, which a
    name/type-driven classifier is structurally blind to. The
    reference's demo data plants exactly this bait: an email address
    in ``seller.city`` (reference:
    extension/src/utility/sql/sample_source_tables/seller.sql:28) that
    its LLM prompt (catalog metadata only, no sample values,
    prompt_template.rs) can never see.

    One aggregation pass over the table (every count is a conditional
    agg in a single job, map-side combined, one exchange with one
    row), then a plan-level ``stack`` unpivot -- same scale shape as
    ``profile_table``. Patterns default to ``text.PII_PATTERNS`` (the
    Java-regex/RE2-common subset, shared with the DuckDB oracle).

    Output: (column_name, pattern, n_rows, n_matching_rows), only
    string columns, every (column, pattern) pair present (zero counts
    included -- the all-clear is information too)."""
    from ..functions.text import PII_PATTERNS

    pats = patterns or PII_PATTERNS
    str_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    cols = [c for c in (columns or str_cols) if c in str_cols]
    if not cols or not pats:
        raise ValueError("pii_scan needs at least one string column and one pattern")
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        for j, p in enumerate(pats.values()):
            aggs.append(
                F.count(F.when(F.col(c).rlike(p), F.lit(1))).alias(f"__m_{i}_{j}")
            )
    one = df.agg(*aggs)
    names = list(pats)
    stack_args = ", ".join(
        f"'{c}', '{names[j]}', __m_{i}_{j}"
        for i, c in enumerate(cols)
        for j in range(len(names))
    )
    return one.selectExpr(
        "__n_rows",
        f"stack({len(cols) * len(names)}, {stack_args}) AS "
        "(column_name, pattern, n_matching_rows)",
    ).select(
        "column_name",
        "pattern",
        F.col("__n_rows").alias("n_rows"),
        "n_matching_rows",
    )


def format_violations(
    df: DataFrame,
    column: str,
    regex: str,
    max_values: int = 100,
) -> DataFrame:
    """Distinct values of ``column`` that do NOT fully match ``regex``,
    with occurrence counts -- the root-cause drill-down after a
    ``pii_scan`` or classifier flag (the reference's planted malformed
    zip, seller.sql last row '01026d', is the canonical hit). NULLs
    are absence, not violation.

    Aggregated before it leaves the cluster: one groupBy over the
    violating rows only (filter pushes to the scan), ordered by count
    desc then value, capped at ``max_values`` rows -- bounded output
    even when a column is pervasively malformed at 100 TB.

    Output: (value, n_rows), at most max_values rows."""
    return (
        df.filter(
            F.col(column).isNotNull() & ~F.col(column).rlike(f"^(?:{regex})$")
        )
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), "value")
        .limit(max_values)
    )
