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
