"""DV consumption layer (business view, PIT) and multi-source hubs."""

import datetime

from pyspark.sql import functions as F

from pg_auto_dw_spark.build.ddl import hub_schema, satellite_schemas
from pg_auto_dw_spark.build.loader import load_hub, load_hub_multi, load_satellite
from pg_auto_dw_spark.build.spec import business_key_from_spec, column_data
from pg_auto_dw_spark.build.views import business_view, pit_table
from pg_auto_dw_spark.sources import load_table
from pg_auto_dw_spark.warehouse import Warehouse

TS1 = datetime.datetime(2024, 6, 1)
TS2 = datetime.datetime(2024, 6, 10)


def customer_bk():
    return business_key_from_spec(
        "main", "customer", "customer",
        [("c_custkey", "bigint")],
        [("c_name", "text", False), ("c_acctbal", "double precision", False)],
    )


def _build(spark, warehouse_dir, sf_dir):
    wh = Warehouse(spark, warehouse_dir)
    bk = customer_bk()
    wh.create_table("dw.hub_customer", hub_schema(bk))
    for name, schema in satellite_schemas(bk).items():
        wh.create_table(f"dw.{name}", schema)
    src = load_table(spark, sf_dir, "customer")
    load_hub(wh, src, bk, load_ts=TS1)
    load_satellite(wh, src, bk, "customer", load_ts=TS1)
    return wh, bk, src


def test_business_view_round_trip(spark, warehouse_dir, sf_dir):
    """build + load + reconstruct == source (the end-to-end DV
    correctness statement)."""
    wh, bk, src = _build(spark, warehouse_dir, sf_dir)
    bv = business_view(wh, bk)
    want = src.select(
        F.col("c_custkey").cast("string").alias("c_custkey_bk"), "c_name", "c_acctbal"
    )
    got = bv.select("c_custkey_bk", "c_name", "c_acctbal")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_business_view_shows_latest_after_change(spark, warehouse_dir, sf_dir):
    wh, bk, src = _build(spark, warehouse_dir, sf_dir)
    changed = src.withColumn(
        "c_name",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("RENAMED")).otherwise(F.col("c_name")),
    )
    load_satellite(wh, changed, bk, "customer", load_ts=TS2)
    bv = business_view(wh, bk)
    renamed = bv.filter(F.col("c_name") == "RENAMED").count()
    assert renamed == src.filter(F.col("c_custkey") % 7 == 0).count()
    # every key appears exactly once (current view, not history)
    assert bv.count() == src.count()


def test_pit_table_effective_timestamps(spark, warehouse_dir, sf_dir):
    wh, bk, src = _build(spark, warehouse_dir, sf_dir)
    changed = src.withColumn("c_acctbal", F.col("c_acctbal") + 1.0)
    load_satellite(wh, changed, bk, "customer", load_ts=TS2)
    pit = pit_table(wh, bk, ["2024-06-05", "2024-06-15"])
    rows = pit.collect()
    n = src.count()
    assert len(rows) == 2 * n
    by_date = {}
    for r in rows:
        by_date.setdefault(str(r["as_of"])[:10], set()).add(
            str(r["sat_customer_load_ts"])[:10]
        )
    assert by_date["2024-06-05"] == {"2024-06-01"}  # only first load effective
    assert by_date["2024-06-15"] == {"2024-06-10"}  # second load effective


def test_multi_source_hub(spark, warehouse_dir, sf_dir):
    """Same business key fed by customer AND orders (o_custkey): keys
    appearing in either source land once; overlap deduplicates with
    source-priority determinism."""
    wh = Warehouse(spark, warehouse_dir)
    bk = business_key_from_spec(
        "main", "customer", "customer", [("c_custkey", "bigint")], []
    )
    # second ColumnData on the part link: orders.o_custkey
    bk.business_key_part_links[0].source_columns.append(
        column_data("sales", "orders", "o_custkey", "bigint", 1)
    )
    wh.create_table("dw.hub_customer", hub_schema(bk))

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    n = load_hub_multi(wh, [(customer, 0), (orders, 1)], bk, load_ts=TS1)

    cust_keys = {r[0] for r in customer.select("c_custkey").collect()}
    order_keys = {r[0] for r in orders.select("o_custkey").distinct().collect()}
    assert n == len(cust_keys | order_keys) + 2  # ghosts

    hub = wh.read("dw.hub_customer")
    # overlapped keys must carry the FIRST source's record_source
    overlap_bk = str(next(iter(cust_keys & order_keys)))
    rs = hub.filter(F.col("c_custkey_bk") == overlap_bk).collect()[0]["record_source"]
    assert rs == "main"
    # orders-only keys carry the second source's schema
    only_orders = order_keys - cust_keys
    if only_orders:
        rs2 = hub.filter(
            F.col("c_custkey_bk") == str(next(iter(only_orders)))
        ).collect()[0]["record_source"]
        assert rs2 == "sales"
    # idempotent
    assert load_hub_multi(wh, [(customer, 0), (orders, 1)], bk, load_ts=TS1) == 0


def test_read_source_formats(spark, sf_dir, tmp_path):
    """CSV, JSON, and ORC feeds load through read_source and drive the
    same hub loader as parquet."""
    from pg_auto_dw_spark.sources import read_source

    src = load_table(spark, sf_dir, "customer").limit(50)
    csv_dir, json_dir, orc_dir = (
        str(tmp_path / "c"), str(tmp_path / "j"), str(tmp_path / "o")
    )
    src.write.option("header", True).csv(csv_dir)
    src.write.json(json_dir)
    src.write.orc(orc_dir)

    csv_df = read_source(spark, csv_dir, "csv", schema=src.schema)
    json_df = read_source(spark, json_dir, "json", schema=src.schema)
    orc_df = read_source(spark, orc_dir, "orc", schema=src.schema)
    assert csv_df.count() == 50 and json_df.count() == 50 and orc_df.count() == 50

    wh = Warehouse(spark, str(tmp_path / "wh"))
    bk = customer_bk()
    wh.create_table("dw.hub_customer", hub_schema(bk))
    assert load_hub(wh, csv_df, bk, load_ts=TS1) == 52
    assert load_hub(wh, json_df, bk, load_ts=TS1) == 0  # same keys -> no-op
    assert load_hub(wh, orc_df, bk, load_ts=TS1) == 0  # same keys -> no-op
