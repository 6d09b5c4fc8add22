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


def validate_constraints(
    df: DataFrame,
    pk_columns: list[str] | None = None,
    not_null: list[str] | None = None,
    fk: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Declarative data-quality audit (dbt-test altitude): one row per
    declared constraint -- (constraint_type, columns, n_violations,
    is_valid) -- all BIGINT/BOOLEAN/STRING, integer-exact.

    - ``pk_columns``: violations = rows beyond the first per duplicate
      key, plus every row with a NULL key part (a Postgres PK forbids
      both).
    - ``not_null``: violations = NULL count per declared column.
    - ``fk``: child column -> (parent DataFrame, parent column);
      violations = child rows (NULLs exempt, like SQL FKs) whose key
      has no parent match.

    Scale shape: the PK and not-null checks share ONE aggregation pass
    over the table (count + count_distinct + null counts -- map-side
    combined); each FK check is a distinct-project of the parent key
    joined to a per-key child count (the join carries one row per
    DISTINCT child key, not per child row). At 100 TB the FK join
    shuffles only the two key projections; a broadcast-Bloom prefilter
    (corpus.bloom_build over the parent keys) can screen the clearly-
    present majority first when even that is too much -- the Bloom
    no-false-negative contract means only probe-misses need the exact
    join."""
    agg_exprs = [F.count(F.lit(1)).alias("__n")]
    if pk_columns:
        key_ok = None
        for c in pk_columns:
            nn = F.col(c).isNotNull()
            key_ok = nn if key_ok is None else (key_ok & nn)
        agg_exprs.append(
            F.count_distinct(
                *[F.when(key_ok, F.col(c)) for c in pk_columns]
            ).alias("__nd_pk")
        )
    for c in not_null or []:
        agg_exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        )
    one = df.agg(*agg_exprs)
    spark = df.sparkSession
    rows = []
    if pk_columns:
        rows.append(
            one.select(
                F.lit("pk_unique").alias("constraint_type"),
                F.lit(",".join(pk_columns)).alias("columns"),
                # (non-null rows - distinct keys) + null-key rows
                # simplifies to total rows - distinct non-null keys
                (F.col("__n") - F.col("__nd_pk")).cast("long").alias("n_violations"),
            )
        )
    for c in not_null or []:
        rows.append(
            one.select(
                F.lit("not_null").alias("constraint_type"),
                F.lit(c).alias("columns"),
                F.col(f"__nn_{c}").cast("long").alias("n_violations"),
            )
        )
    for child_col, (parent, parent_col) in (fk or {}).items():
        # one row per DISTINCT child key with its multiplicity, so the
        # join never carries the child's full row count
        child_keys = (
            df.filter(F.col(child_col).isNotNull())
            .groupBy(F.col(child_col).alias("__k"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        parent_keys = parent.select(F.col(parent_col).alias("__k")).distinct()
        orphans = (
            child_keys.join(parent_keys, "__k", "left_anti")
            .agg(F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_violations"))
            .select(
                F.lit("fk_orphan").alias("constraint_type"),
                F.lit(child_col).alias("columns"),
                F.col("n_violations").cast("long"),
            )
        )
        rows.append(orphans)
    if not rows:
        return spark.createDataFrame(
            [], "constraint_type string, columns string, n_violations long, is_valid boolean"
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(
        "constraint_type",
        "columns",
        "n_violations",
        (F.col("n_violations") == 0).alias("is_valid"),
    )
