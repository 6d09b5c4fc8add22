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
