"""Status engine: latest-response resolution + window flags + CASE
ladder (SURVEY.md W1/W2/A2/F4; reference: extension/src/model/
queries.rs:441-532, identical prep inside insert_into_build_call at
:324-415).

Exact-parity notes:

- latest response per column is MAX(pk) + self-join (A2), kept as in
  the reference instead of row_number so tie behavior is identical;
- ``(confidence_score * 100)::INT::TEXT`` must be computed in decimal:
  the score column is DECIMAL(3,2) end-to-end, because double
  arithmetic (0.85*100 -> 84.999...) would truncate differently;
- status_response uses null-propagating concat (Postgres ``||``), NOT
  concat_ws.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSFORMER_RESPONSES_SCHEMA = T.StructType(
    [
        T.StructField("pk_transformer_responses", T.LongType(), False),
        T.StructField("fk_source_objects", T.LongType(), True),
        T.StructField("model_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("business_key_name", T.StringType(), True),
        T.StructField("confidence_score", T.DecimalType(3, 2), True),
        T.StructField("reason", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

BUILD_CALL_SCHEMA = T.StructType(
    [
        T.StructField("pk_build_call", T.LongType(), False),
        T.StructField("fk_transformer_responses", T.LongType(), True),
        T.StructField("build_id", T.StringType(), True),
        T.StructField("build_flag", T.StringType(), True),
        T.StructField("build_status", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

BKP = "Business Key Part"


def latest_responses(responses: DataFrame) -> DataFrame:
    """Latest transformer response per source column: MAX(pk) GROUP BY fk
    then self-join (reference: queries.rs:332-340)."""
    mx = responses.groupBy("fk_source_objects").agg(
        F.max("pk_transformer_responses").alias("__max_pk")
    )
    return responses.join(
        mx,
        responses["pk_transformer_responses"] == mx["__max_pk"],
        "inner",
    ).drop("__max_pk", mx["fk_source_objects"])


def _pct(score: Column) -> Column:
    # (score * 100)::INT::TEXT || '%' -- decimal-exact (queries.rs:385)
    return F.concat(
        (score * 100).cast("int").cast("string"), F.lit("%")
    )


def status_prep(
    source_objects: DataFrame, responses: DataFrame, threshold: str
) -> DataFrame:
    """source_object_status_prep + status ladder (queries.rs:341-438).

    threshold is the GUC string (e.g. "0.8"); compared in decimal.
    """
    thr = F.lit(threshold).cast("decimal(3,2)")
    s = source_objects.filter(
        (F.col("current_flag") == "Y") & (F.col("deleted_flag") == "N")
    )
    t = latest_responses(responses)
    j = s.join(t, s["pk_source_objects"] == t["fk_source_objects"], "left")

    w = Window.partitionBy("schema_name", "table_name")
    bk_hold = F.max(
        F.when(
            (F.col("category") == BKP) & (F.col("confidence_score") < thr), 1
        ).otherwise(0)
    ).over(w)
    bkp_cnt = F.sum(F.when(F.col("category") == BKP, 1).otherwise(0)).over(w)

    score = F.col("confidence_score")
    cat = F.col("category")
    prep = j.select(
        s["pk_source_objects"],
        "pk_transformer_responses",
        "schema_name",
        "table_name",
        "column_name",
        "column_ordinal_position",
        "confidence_score",
        "reason",
        "category",
        "model_name",
        bk_hold.alias("bk_hold"),
        bkp_cnt.alias("bkp_cnt"),
    )

    status = (
        F.when(score.isNull(), "Queued for Processing")
        # Links
        .when(
            (cat == BKP) & (score >= thr) & (F.col("bkp_cnt") > 1),
            "Ready to Deploy - Awaiting Link Implementation",
        )
        .when(
            (cat != BKP) & (score >= thr) & (F.col("bk_hold") == 0) & (F.col("bkp_cnt") > 1),
            "Ready to Deploy - Awaiting Link Implementation",
        )
        .when(
            (cat != BKP) & (score >= thr) & (F.col("bk_hold") == 1) & (F.col("bkp_cnt") > 1),
            "Ready to Deploy - Awaiting Business Key (BK), Awaiting Link Implementation",
        )
        # Hubs
        .when((cat == BKP) & (score >= thr), "Ready to Deploy")
        .when((cat != BKP) & (score >= thr) & (F.col("bk_hold") == 0), "Ready to Deploy")
        .when(
            (cat != BKP) & (score >= thr) & (F.col("bk_hold") == 1),
            "Ready to Deploy - Awaiting Business Key (BK)",
        )
        .otherwise("Requires Attention")
    )

    confidence_level = F.when(score.isNotNull(), _pct(score)).otherwise(F.lit("-"))

    inner_status = (
        F.when(score.isNull(), "Queued for Processing")
        .when(score >= thr, "Ready to Deploy")
        .otherwise("Requires Attention")
    )
    # Postgres || propagates NULLs -> F.concat (not concat_ws)
    status_response = F.when(
        score.isNotNull(),
        F.concat(
            F.lit("Status: "),
            inner_status,
            F.lit(": "),
            F.lit("Model: "),
            F.col("model_name"),
            F.lit(" categorized this column as a "),
            cat,
            F.lit(" with a confidence of "),
            _pct(score),
            F.lit(".  "),
            F.lit("Model Reasoning: "),
            F.col("reason"),
        ),
    ).otherwise(F.lit("-"))

    return prep.withColumn("status", status).withColumn(
        "confidence_level", confidence_level
    ).withColumn("status_response", status_response)


def source_column_df(
    source_objects: DataFrame, responses: DataFrame, threshold: str
) -> DataFrame:
    """auto_dw.source_column() output (reference: src/lib.rs:113-151,
    queries.rs:441-532): 6 columns ordered by schema, table, ordinal."""
    so = status_prep(source_objects, responses, threshold)
    return so.orderBy("schema_name", "table_name", "column_ordinal_position").select(
        F.col("schema_name").alias("schema"),
        F.col("table_name").alias("table"),
        F.col("column_name").alias("column"),
        "status",
        "confidence_level",
        "status_response",
    )


def source_table_df(
    source_objects: DataFrame, responses: DataFrame, threshold: str
) -> DataFrame:
    """Table-grain rollup. The reference's source_table() is a hardcoded
    demo VALUES set (queries.rs:1-7, SURVEY U3); we return the real
    aggregation its docs describe: one row per table with the least-
    advanced column status."""
    so = status_prep(source_objects, responses, threshold)
    rank = (
        F.when(F.col("status") == "Requires Attention", 0)
        .when(F.col("status") == "Queued for Processing", 1)
        .when(F.col("status").startswith("Ready to Deploy - "), 2)
        .otherwise(3)
    )
    ranked = so.withColumn("__rank", rank)
    agg = ranked.groupBy("schema_name", "table_name").agg(
        F.min("__rank").alias("__min_rank"), F.count(F.lit(1)).alias("n_columns")
    )
    status = (
        F.when(F.col("__min_rank") == 0, "Requires Attention")
        .when(F.col("__min_rank") == 1, "Queued for Processing")
        .when(F.col("__min_rank") == 2, "Ready to Deploy - Awaiting")
        .otherwise("Ready to Deploy")
    )
    return agg.select(
        F.col("schema_name").alias("schema"),
        F.col("table_name").alias("table"),
        status.alias("status"),
        "n_columns",
    ).orderBy("schema", "table")
