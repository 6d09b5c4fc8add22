"""Pending-classification detection + prompt payload assembly
(SURVEY.md A1/P8/A5/F8; reference: extension/src/model/queries.rs:9-62
``SOURCE_OBJECTS_JSON``).

A table needs (re)classification when its newest catalog version
postdates its newest transformer response, or it has none. The payload
packs per-column detail strings and column->pk links as JSON, ordered
by ordinal position (array_agg ORDER BY -> sort_array(collect_list)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tables_requiring_transformation(
    source_objects: DataFrame, responses: DataFrame
) -> DataFrame:
    """A1 + P8: MAX(valid_from) vs MAX(created_at) per table_oid
    (queries.rs:10-23)."""
    s = source_objects.filter(
        (F.col("current_flag") == "Y") & (F.col("deleted_flag") == "N")
    )
    j = s.join(
        responses,
        s["pk_source_objects"] == responses["fk_source_objects"],
        "left",
    )
    cal = j.groupBy("table_oid").agg(
        F.max("valid_from").alias("max_table_update"),
        F.max("created_at").alias("max_table_transformer_generation"),
    )
    return (
        cal.filter(
            (F.col("max_table_update") > F.col("max_table_transformer_generation"))
            | F.col("max_table_transformer_generation").isNull()
        )
        .select("table_oid")
        .distinct()
    )


def source_table_prompts(source_objects: DataFrame, responses: DataFrame) -> DataFrame:
    """One row per pending table: (table_oid, table_column_links JSON,
    table_details JSON) -- mirrors queries.rs:25-62 including the
    'Column No: N Named: ... of type: ...' detail format the client's
    column-number regex (F13) parses back out."""
    s = source_objects.filter(
        (F.col("current_flag") == "Y") & (F.col("deleted_flag") == "N")
    )
    pending = tables_requiring_transformation(source_objects, responses)
    d = s.join(pending, on="table_oid", how="inner")

    column_details = F.concat(
        F.lit("Column No: "),
        F.col("column_ordinal_position").cast("string"),
        F.lit(" Named: "),
        F.col("column_name"),
        F.lit(" of type: "),
        F.col("column_type_name"),
        F.lit(" "),
        F.when(F.col("column_pk_ind") == 1, "And is a primary key.").otherwise(""),
        F.lit("Column Comments: "),
        F.col("column_description"),
    )
    column_link = F.struct(
        F.col("pk_source_objects").alias("PK Source Objects"),
        F.col("column_ordinal_position").alias("Column Ordinal Position"),
    )

    prep = d.select(
        "table_oid",
        "schema_name",
        "table_name",
        F.col("column_ordinal_position").alias("ord"),
        column_link.alias("column_link"),
        column_details.alias("column_details"),
    )
    agg = prep.groupBy("table_oid", "schema_name", "table_name").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ord"), F.col("column_link").alias("link")))
        ).alias("links_sorted"),
        F.array_sort(
            F.collect_list(F.struct(F.col("ord"), F.col("column_details").alias("det")))
        ).alias("details_sorted"),
    )
    return agg.select(
        "table_oid",
        F.to_json(
            F.struct(
                F.transform("links_sorted", lambda x: x["link"]).alias("Column Links")
            )
        ).alias("table_column_links"),
        F.to_json(
            F.struct(
                F.col("schema_name").alias("Schema Name"),
                F.col("table_name").alias("Table Name"),
                F.transform("details_sorted", lambda x: x["det"]).alias("Column Details"),
            )
        ).alias("table_details"),
    )
