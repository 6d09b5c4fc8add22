"""Regression pins for the code-review findings on build/ and catalog/."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.build.builder import assemble_business_keys, build_and_load
from pg_auto_dw_spark.build.ddl import hub_schema, satellite_schemas, spark_type_for
from pg_auto_dw_spark.build.loader import load_satellite
from pg_auto_dw_spark.build.spec import business_key_from_spec, dv_schema_from_spec
from pg_auto_dw_spark.sources import load_table
from pg_auto_dw_spark.warehouse import Warehouse

LOAD_TS = datetime.datetime(2024, 6, 1)


def test_spark_type_for_covers_spark_ddl_names(spark):
    # simple names resolve without a session; complex types go through
    # DataType.fromDDL (needs the active session the real flow has)
    assert spark_type_for("float") == T.FloatType()
    assert spark_type_for("tinyint") == T.ByteType()
    assert spark_type_for("binary") == T.BinaryType()
    assert spark_type_for("array<float>") == T.ArrayType(T.FloatType())
    assert spark_type_for("map<string,int>") == T.MapType(T.StringType(), T.IntegerType())
    assert spark_type_for("varchar(10)") == T.StringType()
    assert spark_type_for("numeric(3,2)") == T.DecimalType(3, 2)
    assert spark_type_for("no_such_type") == T.StringType()


def test_float_descriptor_satellite_roundtrips(spark, warehouse_dir, sf_dir):
    """A float/array descriptor must get a real type in the satellite
    schema so the second read doesn't crash on parquet type mismatch."""
    emb = load_table(spark, sf_dir, "embeddings")
    bk = business_key_from_spec(
        "main", "embeddings", "embedding",
        [("vec_id", "bigint")],
        [("label", "int", False), ("embedding", "array<float>", False)],
    )
    schemas = satellite_schemas(bk)
    field_types = {f.name: f.dataType for f in schemas["sat_embeddings"].fields}
    assert field_types["embedding"] == T.ArrayType(T.FloatType())

    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("dw.hub_embedding", hub_schema(bk))
    for name, schema in schemas.items():
        wh.create_table(f"dw.{name}", schema)
    n = load_satellite(wh, emb, bk, "embeddings", load_ts=LOAD_TS)
    assert n == emb.count()
    # second load reads the table back -- crashes if types were corrupted
    assert load_satellite(wh, emb, bk, "embeddings", load_ts=LOAD_TS) == 0


def test_duplicate_bk_names_fail_loudly(spark, warehouse_dir, sf_dir):
    bk1 = business_key_from_spec("main", "customer", "customer", [("c_custkey", "bigint")], [])
    bk2 = business_key_from_spec("main", "orders", "customer", [("o_custkey", "bigint")], [])
    dv = dv_schema_from_spec("dw", [bk1, bk2])
    wh = Warehouse(spark, warehouse_dir)
    with pytest.raises(ValueError, match="multi-source"):
        build_and_load(wh, lambda s, t: None, dv)


def test_satellite_within_batch_dedup(spark, warehouse_dir, sf_dir):
    """Identical duplicate source rows produce ONE satellite row."""
    src = load_table(spark, sf_dir, "customer").limit(20)
    doubled = src.unionByName(src)
    bk = business_key_from_spec(
        "main", "customer", "customer", [("c_custkey", "bigint")],
        [("c_name", "text", False)],
    )
    wh = Warehouse(spark, warehouse_dir)
    for name, schema in satellite_schemas(bk).items():
        wh.create_table(f"dw.{name}", schema)
    assert load_satellite(wh, doubled, bk, "customer", load_ts=LOAD_TS) == 20


def test_assemble_tolerates_null_rows():
    rows = [
        {
            "table_oid": 10, "schema_name": "s", "table_name": "t",
            "column_category": "Business Key Part", "business_key_name": None,
            "column_name": "id", "column_type_name": "bigint",
            "system_id": 1, "column_ordinal_position": 1,
        },
        {  # dangling join row
            "table_oid": None, "schema_name": None, "table_name": None,
            "column_category": None, "business_key_name": None,
            "column_name": None, "column_type_name": None,
            "system_id": 1, "column_ordinal_position": None,
        },
    ]
    bks = assemble_business_keys(rows)
    assert len(bks) == 1
    assert bks[0].name == ""  # NULL bk name -> empty, no crash


def test_schema_level_context_description(spark, sf_dir, tmp_path):
    from pg_auto_dw_spark.api import AutoDW
    from pg_auto_dw_spark.catalog.registry import testdata_registry

    adw = AutoDW(
        spark, str(tmp_path / "wh"), registry=testdata_registry(),
        clock=lambda: datetime.datetime(2024, 6, 1),
    )
    adw.register_source("main", "customer", load_table(spark, sf_dir, "customer"))
    adw.update_context("main", {"description": "main warehouse schema"})
    adw.source_include("main", "customer")
    so = adw.wh.read("auto_dw.source_objects")
    descs = {r["schema_description"] for r in so.select("schema_description").collect()}
    assert descs == {"main warehouse schema"}
