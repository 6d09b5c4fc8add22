"""Operator catalog: every implemented SURVEY.md section-2 operator as a
(Spark DataFrame builder, DuckDB oracle SQL) pair.

Registration keeps both sides adjacent so column aliases never drift.
Queries marked ``sql=None`` are non-SQL-expressible (driver records a
rows-only check).
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build.spec import business_key_from_spec
from .sources import load_table

LOAD_TS = datetime.datetime(2024, 6, 1)
LOAD_TS_STR = "2024-06-01 00:00:00"

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLE[name] = sql
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)


def customer_business_key():
    """The demo BusinessKey the reference walks through (README Act 1/2),
    transplanted onto the driver's customer table (FIXTURES.md section 1)."""
    return business_key_from_spec(
        schema_name="main",
        table_name="customer",
        bk_name="customer",
        key_columns=[("c_custkey", "bigint")],
        descriptor_columns=[
            ("c_name", "text", False),
            ("c_nationkey", "int", False),
            ("c_acctbal", "double precision", False),
            ("c_mktsegment", "text", False),
        ],
    )


# ---------------------------------------------------------------------------
# DV core: hub / satellite load projections (SURVEY S4,S7,F1,F2,J5,O5)
# ---------------------------------------------------------------------------


@register(
    "hub_load_customer",
    f"""
    SELECT sha256(CAST(c_custkey AS VARCHAR)) AS hub_customer_hk,
           '{LOAD_TS_STR}' AS load_ts,
           'main' AS record_source,
           CAST(c_custkey AS VARCHAR) AS c_custkey_bk
    FROM customer
    """,
)
def hub_load_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub staging rows (reference: dv_loader.rs:160-176): sha256 hash key
    over ::TEXT-rendered BK parts, comma-joined."""
    from .build.loader import hub_stage_df

    src = load_table(spark, sf_dir, "customer")
    df = hub_stage_df(src, customer_business_key(), load_ts=LOAD_TS)
    return df.withColumn("load_ts", F.date_format("load_ts", "yyyy-MM-dd HH:mm:ss"))


@register(
    "sat_load_customer",
    f"""
    SELECT sha256(CAST(c_custkey AS VARCHAR)) AS hub_customer_hk,
           '{LOAD_TS_STR}' AS load_ts,
           'main' AS record_source,
           sha256(concat_ws(',',
                            c_name,
                            CAST(c_nationkey AS VARCHAR),
                            CAST(CAST(c_acctbal AS DECIMAL(38,2)) AS VARCHAR),
                            c_mktsegment)) AS sat_customer_hd,
           c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def sat_load_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Satellite staging rows with hash-diff (reference: dv_loader.rs:325-357)."""
    from .build.loader import satellite_stage_df

    src = load_table(spark, sf_dir, "customer")
    df = satellite_stage_df(src, customer_business_key(), "customer", load_ts=LOAD_TS)
    return df.withColumn("load_ts", F.date_format("load_ts", "yyyy-MM-dd HH:mm:ss"))


@register(
    "ghost_records_customer",
    """
    SELECT sha256('-1') AS hub_customer_hk,
           '0001-01-01 00:00:00' AS load_ts,
           'SYSTEM' AS record_source,
           '-1' AS c_custkey_bk
    UNION ALL
    SELECT sha256('-2'), '0001-01-01 00:00:00', 'SYSTEM', '-2'
    """,
)
def ghost_records_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ghost-record union (reference: dv_loader.rs:110-135; SURVEY O5)."""
    from .build.loader import ghost_records_df

    src = load_table(spark, sf_dir, "customer")
    df = ghost_records_df(src, customer_business_key())
    return df.withColumn("load_ts", F.date_format("load_ts", "yyyy-MM-dd HH:mm:ss"))


@register(
    "hub_new_keys_anti_join",
    """
    SELECT sha256(CAST(c_custkey AS VARCHAR)) AS hub_customer_hk,
           CAST(c_custkey AS VARCHAR) AS c_custkey_bk
    FROM customer
    WHERE sha256(CAST(c_custkey AS VARCHAR)) NOT IN (
        SELECT sha256(CAST(c_custkey AS VARCHAR)) FROM customer WHERE c_custkey % 2 = 0
    )
    """,
)
def hub_new_keys_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-hub-keys anti-join (reference: dv_loader.rs:177-181; SURVEY J5):
    stage anti-joined against an already-loaded hub (simulated as the
    even-key half of customer)."""
    from .build.loader import hub_stage_df

    src = load_table(spark, sf_dir, "customer")
    bk = customer_business_key()
    staged = hub_stage_df(src, bk, load_ts=LOAD_TS).select(
        "hub_customer_hk", "c_custkey_bk"
    )
    existing = hub_stage_df(
        src.filter(F.col("c_custkey") % 2 == 0), bk, load_ts=LOAD_TS
    ).select("hub_customer_hk")
    return staged.join(existing, on="hub_customer_hk", how="left_anti")


# ---------------------------------------------------------------------------
# Status engine (SURVEY W1/W2/A2/F4/P2/P5/P9/J1/J6) over shared fixtures
# ---------------------------------------------------------------------------

from .fixtures import (  # noqa: E402
    source_objects_df,
    source_objects_values_sql,
    transformer_responses_df,
    transformer_responses_values_sql,
)

_STATUS_ORACLE = f"""
WITH
confidence_level AS (SELECT CAST(0.8 AS DECIMAL(3,2)) AS value),
so AS (SELECT * FROM {source_objects_values_sql()}),
tr AS (SELECT * FROM {transformer_responses_values_sql()}),
cal AS (
    SELECT MAX(pk_transformer_responses) AS max_pk
    FROM tr GROUP BY fk_source_objects
),
latest AS (
    SELECT tr.* FROM tr JOIN cal ON tr.pk_transformer_responses = cal.max_pk
),
prep AS (
    SELECT
        t.pk_transformer_responses,
        s.schema_name, s.table_name, s.column_name, s.column_ordinal_position,
        t.confidence_score, t.reason, t.category, t.model_name,
        MAX(CASE WHEN t.category = 'Business Key Part'
                  AND t.confidence_score < cl.value THEN 1 ELSE 0 END)
            OVER (PARTITION BY s.schema_name, s.table_name) AS bk_hold,
        SUM(CASE WHEN t.category = 'Business Key Part' THEN 1 ELSE 0 END)
            OVER (PARTITION BY s.schema_name, s.table_name) AS bkp_cnt
    FROM so AS s
    JOIN confidence_level AS cl ON true
    LEFT JOIN latest AS t ON s.pk_source_objects = t.fk_source_objects
    WHERE s.current_flag = 'Y' AND s.deleted_flag = 'N'
),
source_object AS (
    SELECT *,
        CASE
            WHEN confidence_score IS NULL THEN 'Queued for Processing'
            WHEN category = 'Business Key Part' AND confidence_score >= cl.value
                 AND bkp_cnt > 1 THEN 'Ready to Deploy - Awaiting Link Implementation'
            WHEN category <> 'Business Key Part' AND confidence_score >= cl.value
                 AND bk_hold = 0 AND bkp_cnt > 1
                 THEN 'Ready to Deploy - Awaiting Link Implementation'
            WHEN category <> 'Business Key Part' AND confidence_score >= cl.value
                 AND bk_hold = 1 AND bkp_cnt > 1
                 THEN 'Ready to Deploy - Awaiting Business Key (BK), Awaiting Link Implementation'
            WHEN category = 'Business Key Part' AND confidence_score >= cl.value
                 THEN 'Ready to Deploy'
            WHEN category <> 'Business Key Part' AND confidence_score >= cl.value
                 AND bk_hold = 0 THEN 'Ready to Deploy'
            WHEN category <> 'Business Key Part' AND confidence_score >= cl.value
                 AND bk_hold = 1 THEN 'Ready to Deploy - Awaiting Business Key (BK)'
            ELSE 'Requires Attention'
        END AS status,
        CASE WHEN confidence_score IS NOT NULL
             THEN CAST(CAST(confidence_score * 100 AS INT) AS VARCHAR) || '%'
             ELSE '-' END AS confidence_level,
        CASE WHEN confidence_score IS NOT NULL THEN
            'Status: ' ||
            CASE WHEN confidence_score >= cl.value THEN 'Ready to Deploy'
                 ELSE 'Requires Attention' END || ': ' ||
            'Model: ' || model_name ||
            ' categorized this column as a ' || category ||
            ' with a confidence of ' ||
            CAST(CAST(confidence_score * 100 AS INT) AS VARCHAR) || '%' || '.  ' ||
            'Model Reasoning: ' || reason
        ELSE '-' END AS status_response
    FROM prep
    JOIN confidence_level AS cl ON true
)
SELECT schema_name AS "schema", table_name AS "table", column_name AS "column",
       status, confidence_level, status_response
FROM source_object
"""


@register("status_source_column", _STATUS_ORACLE)
def status_source_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auto_dw.source_column() status ladder (reference: queries.rs:441-532)
    over the shared inline fixture: exercises A2 latest-response, W1/W2
    window flags, and every CASE branch incl. composite-BK links."""
    from .model.status import source_column_df

    return source_column_df(
        source_objects_df(spark), transformer_responses_df(spark), "0.8"
    )


@register(
    "status_window_flags",
    f"""
    WITH
    confidence_level AS (SELECT CAST(0.8 AS DECIMAL(3,2)) AS value),
    so AS (SELECT * FROM {source_objects_values_sql()}),
    tr AS (SELECT * FROM {transformer_responses_values_sql()}),
    cal AS (SELECT MAX(pk_transformer_responses) AS max_pk FROM tr GROUP BY fk_source_objects),
    latest AS (SELECT tr.* FROM tr JOIN cal ON tr.pk_transformer_responses = cal.max_pk)
    SELECT
        s.pk_source_objects,
        MAX(CASE WHEN t.category = 'Business Key Part'
                  AND t.confidence_score < cl.value THEN 1 ELSE 0 END)
            OVER (PARTITION BY s.schema_name, s.table_name) AS bk_hold,
        CAST(SUM(CASE WHEN t.category = 'Business Key Part' THEN 1 ELSE 0 END)
            OVER (PARTITION BY s.schema_name, s.table_name) AS BIGINT) AS bkp_cnt
    FROM so AS s
    JOIN confidence_level AS cl ON true
    LEFT JOIN latest AS t ON s.pk_source_objects = t.fk_source_objects
    WHERE s.current_flag = 'Y' AND s.deleted_flag = 'N'
    """,
)
def status_window_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 whole-partition window flags in isolation (queries.rs:352-363)."""
    from .model.status import status_prep

    return status_prep(
        source_objects_df(spark), transformer_responses_df(spark), "0.8"
    ).select("pk_source_objects", "bk_hold", F.col("bkp_cnt").cast("bigint").alias("bkp_cnt"))


@register(
    "latest_transformer_responses",
    f"""
    WITH tr AS (SELECT * FROM {transformer_responses_values_sql()}),
    cal AS (SELECT MAX(pk_transformer_responses) AS max_pk FROM tr GROUP BY fk_source_objects)
    SELECT tr.pk_transformer_responses, tr.fk_source_objects, tr.category,
           CAST(tr.confidence_score AS DOUBLE) AS confidence_score
    FROM tr JOIN cal ON tr.pk_transformer_responses = cal.max_pk
    """,
)
def latest_transformer_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 latest-per-group via MAX(pk)+self-join (queries.rs:332-340)."""
    from .model.status import latest_responses

    return latest_responses(transformer_responses_df(spark)).select(
        "pk_transformer_responses",
        "fk_source_objects",
        "category",
        F.col("confidence_score").cast("double").alias("confidence_score"),
    )


# ---------------------------------------------------------------------------
# Include/exclude keyed-list semantics (SURVEY O3/O4/P3) on documents
# ---------------------------------------------------------------------------


@register(
    "tracking_union_except",
    """
    SELECT doc_id FROM documents WHERE source = 'src0'
    UNION
    SELECT doc_id FROM documents WHERE regexp_matches(lang, '^(en|de)$')
    EXCEPT
    SELECT doc_id FROM documents WHERE n_chars < 100
    """,
)
def tracking_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's include/exclude list algebra (queries.rs:164-194):
    deduplicating UNION then EXCEPT, with regex include patterns."""
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.filter(F.col("source") == "src0").select("doc_id")
    inc = docs.filter(F.col("lang").rlike("^(en|de)$")).select("doc_id")
    exc = docs.filter(F.col("n_chars") < 100).select("doc_id")
    return cur.union(inc).distinct().subtract(exc)


# ---------------------------------------------------------------------------
# SCD2 merge final-state (SURVEY S8/P6/P7/J5/J8; queries.rs:221-321)
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH
cur(pk_source_objects, column_name, column_ordinal_position, column_type_name,
    current_flag, deleted_flag, has_valid_to) AS (VALUES
    (1, 'a', 1, 'int',      'Y', 'N', 0),
    (2, 'b', 2, 'int',      'Y', 'N', 0),
    (3, 'c', 3, 'int',      'Y', 'N', 0),
    (4, 'd', 4, 'int',      'Y', 'Y', 0),
    (5, 'b', 2, 'smallint', 'N', 'N', 1)),
snap(s_col, s_ord, s_typ) AS (VALUES
    ('a', 1, 'int'), ('b', 2, 'text'), ('d', 4, 'int'), ('e', 5, 'int')),
cur_y AS (SELECT * FROM cur WHERE current_flag = 'Y'),
cur_n AS (SELECT * FROM cur WHERE current_flag <> 'Y'),
j AS (
    SELECT cur_y.*, snap.s_col, snap.s_typ,
           (snap.s_ord IS NOT NULL) AS m,
           ((snap.s_ord IS NOT NULL) AND
            (cur_y.column_name IS DISTINCT FROM snap.s_col OR
             cur_y.column_type_name IS DISTINCT FROM snap.s_typ)) AS changed
    FROM cur_y LEFT JOIN snap ON cur_y.column_ordinal_position = snap.s_ord
),
upd AS (
    SELECT pk_source_objects, column_name, column_ordinal_position, column_type_name,
           CASE WHEN changed THEN 'N' ELSE current_flag END AS current_flag,
           CASE WHEN NOT m THEN 'Y'
                WHEN m AND NOT changed AND deleted_flag = 'Y' THEN 'N'
                ELSE deleted_flag END AS deleted_flag,
           CASE WHEN changed THEN 1 ELSE has_valid_to END AS has_valid_to
    FROM j
),
ins AS (
    SELECT 5 + CAST(ROW_NUMBER() OVER (ORDER BY s.s_ord) AS BIGINT) AS pk_source_objects,
           s.s_col AS column_name, s.s_ord AS column_ordinal_position,
           s.s_typ AS column_type_name,
           'Y' AS current_flag, 'N' AS deleted_flag, 0 AS has_valid_to
    FROM snap AS s
    WHERE s.s_ord NOT IN (SELECT column_ordinal_position FROM j WHERE NOT changed)
)
SELECT CAST(pk_source_objects AS BIGINT) AS pk_source_objects, column_name,
       column_ordinal_position, column_type_name, current_flag, deleted_flag,
       has_valid_to
FROM upd
UNION ALL
SELECT CAST(pk_source_objects AS BIGINT), column_name, column_ordinal_position,
       column_type_name, current_flag, deleted_flag, has_valid_to
FROM cur_n
UNION ALL
SELECT pk_source_objects, column_name, column_ordinal_position, column_type_name,
       current_flag, deleted_flag, has_valid_to
FROM ins
"""


@register("scd2_merge_state", _SCD2_ORACLE)
def scd2_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the real 4-step SCD2 merge (catalog/scd2.py) on a fixture
    covering every transition -- unchanged, type-change close+reinsert,
    delete, resurrect, untouched history -- and returns the final table
    state. Oracle recomputes the same state in SQL."""
    import tempfile

    from .catalog.scd2 import SOURCE_OBJECTS_SCHEMA, ensure_table, merge_snapshot
    from .warehouse import Warehouse

    as_of = datetime.datetime(2024, 6, 1)
    earlier = datetime.datetime(2024, 1, 1)

    def so_row(pk, col, ord_, typ, cur, dele, valid_to):
        return (
            pk, 1, "s", "NA", 10, "t", "NA", ord_, col, typ.split("(")[0], None,
            typ, "NA", 0, "NA", 0, "N", earlier, valid_to, cur, dele,
        )

    cur_rows = [
        so_row(1, "a", 1, "int", "Y", "N", None),
        so_row(2, "b", 2, "int", "Y", "N", None),
        so_row(3, "c", 3, "int", "Y", "N", None),
        so_row(4, "d", 4, "int", "Y", "Y", None),
        so_row(5, "b", 2, "smallint", "N", "N", earlier),
    ]

    def snap_row(col, ord_, typ):
        return (1, "s", "NA", 10, "t", "NA", ord_, col, typ.split("(")[0], None,
                typ, "NA", 0, "NA", 0)

    snap_rows = [
        snap_row("a", 1, "int"),
        snap_row("b", 2, "text"),
        snap_row("d", 4, "int"),
        snap_row("e", 5, "int"),
    ]

    from .catalog.introspect import SNAPSHOT_SCHEMA

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="autodw_scd2_"))
    ensure_table(wh)
    wh.append(
        "auto_dw.source_objects", spark.createDataFrame(cur_rows, SOURCE_OBJECTS_SCHEMA)
    )
    merge_snapshot(wh, spark.createDataFrame(snap_rows, SNAPSHOT_SCHEMA), as_of=as_of)
    final = wh.read("auto_dw.source_objects")
    return final.select(
        "pk_source_objects",
        "column_name",
        "column_ordinal_position",
        "column_type_name",
        "current_flag",
        "deleted_flag",
        F.when(F.col("valid_to").isNotNull(), 1).otherwise(0).alias("has_valid_to"),
    )


# ---------------------------------------------------------------------------
# Analytical coverage (SURVEY A1/A3/A6/J2/J4/O1/O2/F4-F9) + bench headliners.
# Doubles aggregate through DECIMAL (exact, order-independent) and emit
# DOUBLE so Spark and DuckDB hash identically.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (1 - CAST(l_discount AS DECIMAL(18,4))) *
                    (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the multi-aggregate groupBy shape
    of the reference's A1/A6 operators at data scale."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    charge = disc_price * (1 + dec("l_tax"))
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("dq"),
            F.sum(dec("l_extendedprice")).alias("dp"),
            F.sum(disc_price).alias("ddp"),
            F.sum(charge).alias("dch"),
            F.sum(dec("l_discount")).alias("ddisc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("dq").cast("double").alias("sum_qty"),
        F.col("dp").cast("double").alias("sum_base_price"),
        F.col("ddp").cast("double").alias("sum_disc_price"),
        F.col("dch").cast("double").alias("sum_charge"),
        (F.col("dq").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("dp").cast("double") / F.col("count_order")).alias("avg_price"),
        (F.col("ddisc").cast("double") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter -> 3-way join -> agg -> top-n.
    customer is broadcast (small side); lineitem never shuffles twice."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    dec = lambda c_: F.col(c_).cast("decimal(18,4)")  # noqa: E731
    j = li.join(
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]),
        li["l_orderkey"] == o["o_orderkey"],
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("rev"))
        .select(
            "l_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join (SURVEY J4 at data scale): all
    dimension sides broadcast; only the orders-lineitem join shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = lambda c_: F.col(c_).cast("decimal(18,4)")  # noqa: E731
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("rev"))
        .select("n_name", F.col("rev").cast("double").alias("revenue"))
    )


@register(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() top-n per group -- the idiomatic Spark replacement the
    survey names for the A2 latest-per-group pattern (SURVEY 2.5)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double"))
    )


@register(
    "events_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch rollup on the event stream table (the batch
    twin of the streaming job in streaming/jobs.py), including the
    nanos->micros timestamp normalization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@register(
    "part_name_tokens_explode",
    """
    SELECT p_partkey, token
    FROM part, unnest(string_split(p_name, ' ')) AS t(token)
    """,
)
def part_name_tokens_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode (SURVEY F9: unnest(conkey) analog) over part names."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("token"))


@register(
    "orders_json_payload",
    """
    SELECT o_orderkey,
           to_json(struct_pack(
               "Order Key" := o_orderkey,
               "Status" := o_orderstatus,
               "Priority" := o_orderpriority)) AS payload
    FROM orders
    """,
)
def orders_json_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_build_object analog (SURVEY F8): to_json(named_struct(...))
    produces byte-identical compact JSON in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("Order Key"),
                F.col("o_orderstatus").alias("Status"),
                F.col("o_orderpriority").alias("Priority"),
            )
        ).alias("payload"),
    )


@register(
    "orders_without_lineitems_anti",
    """
    SELECT o_orderkey FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """,
)
def orders_without_lineitems_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti at data scale (SURVEY J5/J8)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti").select("o_orderkey")


@register(
    "customer_order_coalesce_outer",
    """
    SELECT c_custkey,
           COALESCE(CAST(cnt AS BIGINT), 0) AS n_orders
    FROM customer
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
      ON c_custkey = oc.o_custkey
    """,
)
def customer_order_coalesce_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN + COALESCE default (SURVEY J1/F5)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    oc = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return c.join(oc, c["c_custkey"] == oc["o_custkey"], "left").select(
        "c_custkey", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders")
    )
