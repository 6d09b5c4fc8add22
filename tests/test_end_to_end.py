"""Full pipeline: register sources -> include -> crawl -> classify
(stub) -> status -> go() -> hubs/sats exist and are idempotent.
Mirrors the reference's README Act-1/Act-2 walkthrough on the driver's
testdata."""

import datetime

from pyspark.sql import functions as F

from pg_auto_dw_spark.api import AutoDW
from pg_auto_dw_spark.catalog.registry import testdata_registry as _testdata_registry
from pg_auto_dw_spark.sources import load_table

CLOCK = lambda: datetime.datetime(2024, 6, 1, 12, 0, 0)  # noqa: E731
LOAD_TS = datetime.datetime(2024, 6, 2)


def make_autodw(spark, warehouse_dir, sf_dir, tables=("customer", "supplier")):
    adw = AutoDW(
        spark,
        warehouse_dir,
        registry=_testdata_registry(),
        clock=CLOCK,
    )
    for t in tables:
        adw.register_source("main", t, load_table(spark, sf_dir, t))
    return adw


def test_full_pipeline(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)

    # include only customer; crawl tracks its 5 columns
    assert adw.source_include("main", "customer") == "Pattern Included"
    so = adw.wh.read("auto_dw.source_objects")
    assert so.count() == 5
    assert so.filter(F.col("column_pk_ind") == 1).count() == 1

    # default crawl (a^) keeps tracking only what's included
    adw.crawl()
    assert adw.wh.read("auto_dw.source_objects").count() == 5

    # classify with the deterministic stub
    n = adw.classify_pending()
    assert n == 5
    # second run: nothing pending (A1/P8 cutoff)
    assert adw.classify_pending() == 0

    # status: c_custkey is a BK part (PK) -> whole table Ready to Deploy
    sc = adw.source_column().collect()
    assert len(sc) == 5
    by_col = {r["column"]: r for r in sc}
    assert by_col["c_custkey"]["status"] == "Ready to Deploy"
    assert by_col["c_name"]["status"] == "Ready to Deploy"
    assert by_col["c_custkey"]["confidence_level"] == "95%"
    st = adw.source_table().collect()
    assert len(st) == 1 and st[0]["status"] == "Ready to Deploy"

    # go(): builds hub_customer + sat_customer(+sensitive: c_name is PII-ish)
    msg = adw.go(load_ts=LOAD_TS)
    assert "Build ID:" in msg
    dv = adw.latest_dv_schema()
    assert dv is not None
    assert [bk.name for bk in dv.business_keys] == ["customer"]
    bk = dv.business_keys[0]
    assert bk.business_key_part_links[0].alias == "c_custkey"
    assert bk.business_key_part_links[0].target_column.column_name == "c_custkey_bk"
    sats = set(bk.satellites())
    assert sats == {"customer", "customer_sensitive"}  # c_name -> sensitive

    n_src = adw.resolve_source("main", "customer").count()
    hub = adw.wh.read("dw.hub_customer")
    assert hub.count() == n_src + 2
    sat = adw.wh.read("dw.sat_customer")
    assert sat.count() == n_src
    sat_s = adw.wh.read("dw.sat_customer_sensitive")
    assert sat_s.count() == n_src
    assert "c_name" in sat_s.columns and "c_name" not in sat.columns

    # second go(): new build, but loads append nothing (idempotent)
    adw.go(load_ts=LOAD_TS)
    assert adw.wh.read("dw.hub_customer").count() == n_src + 2
    assert adw.wh.read("dw.sat_customer").count() == n_src


def test_scd2_lifecycle(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    adw.source_include("main", "customer")

    # drop a column from the source -> next crawl marks it deleted
    full = adw.resolve_source("main", "customer")
    adw.register_source("main", "customer", full.drop("c_mktsegment"))
    counts = adw.crawl()
    assert counts["deleted"] == 1
    so = adw.wh.read("auto_dw.source_objects")
    deleted = so.filter(F.col("deleted_flag") == "Y")
    assert [r["column_name"] for r in deleted.collect()] == ["c_mktsegment"]

    # a default crawl can't resurrect: the deleted key left the tracked
    # list (queries.rs:170-176 requires deleted_flag='N'), matching the
    # reference, where only a fresh source_include() brings it back
    adw.register_source("main", "customer", full)
    assert adw.crawl()["resurrected"] == 0
    counts = adw.crawl(include=("main", "customer", ".*"))
    assert counts["resurrected"] == 1
    so = adw.wh.read("auto_dw.source_objects")
    assert so.filter(F.col("deleted_flag") == "Y").count() == 0
    assert so.filter(F.col("current_flag") == "Y").count() == 5

    # type change -> close old version + insert new one
    altered = full.withColumn("c_acctbal", F.col("c_acctbal").cast("decimal(12,2)"))
    adw.register_source("main", "customer", altered)
    counts = adw.crawl()
    assert counts["closed"] == 1 and counts["inserted"] == 1
    so = adw.wh.read("auto_dw.source_objects")
    hist = so.filter(F.col("column_name") == "c_acctbal").orderBy("pk_source_objects")
    rows = hist.collect()
    assert len(rows) == 2
    assert rows[0]["current_flag"] == "N" and rows[0]["valid_to"] is not None
    assert rows[1]["current_flag"] == "Y" and rows[1]["column_type_name"] == "decimal(12,2)"


def test_exclude_pattern(spark, warehouse_dir, sf_dir):
    adw = make_autodw(spark, warehouse_dir, sf_dir)
    adw.source_include("main")  # both tables: 5 + 4 columns
    assert adw.wh.read("auto_dw.source_objects").count() == 9
    adw.source_exclude("main", "supplier")
    so = adw.wh.read("auto_dw.source_objects")
    # exclusion removes supplier keys from tracking -> marked deleted
    assert (
        so.filter((F.col("table_name") == "supplier") & (F.col("deleted_flag") == "Y")).count()
        == 4
    )
    assert (
        so.filter((F.col("table_name") == "customer") & (F.col("deleted_flag") == "N")).count()
        == 5
    )


def test_hash_matches_reference_udf():
    assert (
        AutoDW.hash("hello")
        == "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
    )


def test_partitioned_dv_load(spark, warehouse_dir, sf_dir):
    from pg_auto_dw_spark.api import AutoDW
    from pg_auto_dw_spark.sources import load_table
    import datetime
    import os

    adw = AutoDW(
        spark,
        warehouse_dir,
        registry=_testdata_registry(),
        clock=CLOCK,
        partition_dv_by_load_date=True,
    )
    adw.register_source("main", "customer", load_table(spark, sf_dir, "customer"))
    adw.source_include("main", "customer")
    adw.classify_pending()
    adw.go(load_ts=LOAD_TS)

    hub = adw.wh.read("dw.hub_customer")
    n_src = adw.resolve_source("main", "customer").count()
    assert hub.count() == n_src + 2
    assert "load_date" in hub.columns
    # physical layout: hive-style load_date= directories
    hub_dir = adw.wh.path("dw.hub_customer")
    parts = [d for d in os.listdir(hub_dir) if d.startswith("load_date=")]
    assert any(d == "load_date=2024-06-02" for d in parts)
    # ghost rows land in the year-0001 partition
    assert any(d == "load_date=0001-01-01" for d in parts)
    # partition pruning: filtering on load_date scans one partition
    pruned = hub.filter(F.col("load_date") == "2024-06-02")
    assert pruned.count() == n_src
    # idempotent under partitioning too
    adw.go(load_ts=datetime.datetime(2024, 6, 3))
    assert adw.wh.read("dw.hub_customer").count() == n_src + 2
