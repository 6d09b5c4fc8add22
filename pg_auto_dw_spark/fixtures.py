"""Shared inline fixtures for oracle-gated metadata queries.

The status engine and SCD2 merge operate on auto_dw metadata tables
that don't exist in the driver's parquet test set, so their oracle
pairs are built from identical inline VALUES on both sides (SURVEY S1:
the reference's own source_table() is a VALUES scan). One Python
definition generates both the Spark DataFrame and the DuckDB VALUES
clause, so the fixtures cannot drift.

The rows model the reference's demo walkthrough (README Act 1/2,
FIXTURES.md): a clean single-BK table, a composite-BK table with one
low-confidence part (exercising every branch of the status ladder),
and an unclassified table.
"""

from __future__ import annotations

# source_objects: (pk, schema_name, table_name, column_name, ordinal,
#                  current_flag, deleted_flag)
SOURCE_OBJECTS_ROWS = [
    (1, "public", "customer", "customer_id", 1, "Y", "N"),
    (2, "public", "customer", "city", 2, "Y", "N"),
    (3, "public", "customer", "state", 3, "Y", "N"),
    (4, "public", "customer", "zip", 4, "Y", "N"),
    (5, "public", "order_details", "order_id", 1, "Y", "N"),
    (6, "public", "order_details", "product_id", 2, "Y", "N"),
    (7, "public", "order_details", "quantity", 3, "Y", "N"),
    (8, "public", "events_log", "event_id", 1, "Y", "N"),
    (9, "public", "events_log", "payload", 2, "Y", "N"),
    # closed + deleted rows must be ignored by the status engine
    (10, "public", "customer", "zip_old", 4, "N", "N"),
    (11, "public", "customer", "fax", 5, "Y", "Y"),
]

# transformer_responses: (pk, fk, model_name, category, business_key_name,
#                         confidence_score, reason)
# pk 101 is an older response for customer_id superseded by 107 (A2).
TRANSFORMER_RESPONSES_ROWS = [
    (101, 1, "m1", "Descriptor", "NA", "0.60", "early guess"),
    (102, 2, "m1", "Descriptor", "NA", "1.00", "city descriptor"),
    (103, 3, "m1", "Descriptor", "NA", "1.00", "state descriptor"),
    (104, 4, "m1", "Descriptor - Sensitive", "NA", "0.90", "zip is PII"),
    (105, 5, "m1", "Business Key Part", "order", "0.95", "order id"),
    (106, 6, "m1", "Business Key Part", "product", "0.70", "product id"),
    (107, 1, "m2", "Business Key Part", "customer", "0.95", "customer id"),
    (108, 7, "m1", "Descriptor", "NA", "1.00", "quantity descriptor"),
]


# Fixture DataFrames are built from SQL VALUES, not createDataFrame:
# a VALUES scan plans as a Catalyst LocalRelation (no parallelize-RDD
# stage of <cores> near-empty tasks per downstream job), which both
# matches the reference's inline-VALUES altitude (SURVEY S1) and cut
# the measured status_source_column steady-state from ~1.5s to ~0.7s
# at 32 shuffle partitions (r3 VERDICT directive 7).


def _values_clause(rows) -> str:
    return ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)


def local_relation_df(spark, rows, schema):
    """Build a DataFrame from inline rows as a VALUES scan (Catalyst
    LocalRelation) with every column cast to ``schema``'s type.

    Drop-in for ``spark.createDataFrame(rows, schema)`` on small
    metadata fixtures: a parallelized RDD schedules <cores> near-empty
    tasks for every downstream stage, a LocalRelation schedules none.
    Supports the types our metadata schemas use (ints, strings,
    decimals, timestamps); None maps to typed NULL."""
    import datetime as _dt

    def lit(v):
        if isinstance(v, _dt.datetime):
            return "'" + v.strftime("%Y-%m-%d %H:%M:%S") + "'"
        return _sql_lit(v)

    values = ",\n".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    cols = ", ".join(
        f"CAST(col{i + 1} AS {f.dataType.simpleString()}) AS {f.name}"
        for i, f in enumerate(schema.fields)
    )
    return spark.sql(f"SELECT {cols} FROM VALUES {values}")


def source_objects_df(spark):
    return spark.sql(
        "SELECT CAST(col1 AS BIGINT) AS pk_source_objects, col2 AS schema_name, "
        "col3 AS table_name, col4 AS column_name, "
        "CAST(col5 AS INT) AS column_ordinal_position, "
        "col6 AS current_flag, col7 AS deleted_flag FROM VALUES "
        + _values_clause(SOURCE_OBJECTS_ROWS)
    )


def transformer_responses_df(spark):
    return spark.sql(
        "SELECT CAST(col1 AS BIGINT) AS pk_transformer_responses, "
        "CAST(col2 AS BIGINT) AS fk_source_objects, col3 AS model_name, "
        "col4 AS category, col5 AS business_key_name, "
        "CAST(col6 AS DECIMAL(3,2)) AS confidence_score, col7 AS reason FROM VALUES "
        + _values_clause(TRANSFORMER_RESPONSES_ROWS)
    )


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def source_objects_values_sql() -> str:
    rows = ",\n".join(
        "(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in SOURCE_OBJECTS_ROWS
    )
    return (
        "(VALUES\n" + rows + "\n) AS so(pk_source_objects, schema_name, table_name,"
        " column_name, column_ordinal_position, current_flag, deleted_flag)"
    )


def transformer_responses_values_sql() -> str:
    rows = ",\n".join(
        "("
        + ", ".join(
            [
                _sql_lit(pk),
                _sql_lit(fk),
                _sql_lit(m),
                _sql_lit(c),
                _sql_lit(b),
                f"CAST({s} AS DECIMAL(3,2))",
                _sql_lit(r),
            ]
        )
        + ")"
        for pk, fk, m, c, b, s, r in TRANSFORMER_RESPONSES_ROWS
    )
    return (
        "(VALUES\n" + rows + "\n) AS tr(pk_transformer_responses, fk_source_objects,"
        " model_name, category, business_key_name, confidence_score, reason)"
    )
