"""Crash-safety of Warehouse.overwrite: generation-dir + pointer-file
commit (the single-transaction stand-in for the reference's one-script
SCD2 merge, reference: controller/dv_loader.rs:59-64).

Each test simulates one crash window and asserts the table stays
readable with a consistent generation, and that init-time GC removes
the leftovers."""

import os
import shutil

from pyspark.sql import types as T

import pg_auto_dw_spark.warehouse as whmod
from pg_auto_dw_spark.warehouse import Warehouse

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, tag, n=5):
    return spark.createDataFrame([(i, f"{tag}{i}") for i in range(n)], SCHEMA)


def _vals(wh, name="m.t"):
    return {r["v"] for r in wh.read(name).collect()}


def test_overwrite_roundtrip_single_generation(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    wh.overwrite("m.t", _df(spark, "b"))
    assert _vals(wh) == {f"b{i}" for i in range(5)}
    gens = [e for e in os.listdir(warehouse_dir) if "__gen-" in e]
    assert len(gens) == 1  # superseded generations cleaned inline


def test_crash_before_pointer_swap_keeps_old_generation(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    # a fully-written but never-committed generation (crash pre-commit)
    stray = wh._base("m.t") + "__gen-deadbeef"
    shutil.copytree(wh.path("m.t"), stray)
    wh2 = Warehouse(spark, warehouse_dir)
    assert _vals(wh2) == {f"a{i}" for i in range(5)}
    assert not os.path.isdir(stray)  # init GC removed the orphan


def test_crash_during_cleanup_recovers_on_init(spark, warehouse_dir, monkeypatch):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    # commit succeeds, post-commit cleanup of the old generation "crashes"
    monkeypatch.setattr(whmod.shutil, "rmtree", lambda *a, **k: None)
    wh.overwrite("m.t", _df(spark, "b"))
    monkeypatch.undo()
    assert _vals(wh) == {f"b{i}" for i in range(5)}
    assert len([e for e in os.listdir(warehouse_dir) if "__gen-" in e]) == 2
    wh2 = Warehouse(spark, warehouse_dir)
    assert _vals(wh2) == {f"b{i}" for i in range(5)}
    assert len([e for e in os.listdir(warehouse_dir) if "__gen-" in e]) == 1


def test_legacy_staging_and_backup_dirs_gcd(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    for leftover in ("m__t.staging-0ld", "m__t.old-0ld"):
        os.makedirs(os.path.join(warehouse_dir, leftover))
    with open(os.path.join(warehouse_dir, "m__t.live.tmp-x"), "w") as f:
        f.write("junk")
    wh2 = Warehouse(spark, warehouse_dir)
    entries = set(os.listdir(warehouse_dir))
    assert "m__t.staging-0ld" not in entries
    assert "m__t.old-0ld" not in entries
    assert "m__t.live.tmp-x" not in entries
    assert _vals(wh2) == {f"a{i}" for i in range(5)}


def test_append_lands_in_live_generation(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    wh.append("m.t", _df(spark, "x", n=2))
    assert _vals(wh) == {f"a{i}" for i in range(5)} | {"x0", "x1"}
    # and a reopened warehouse sees the same rows
    assert _vals(Warehouse(spark, warehouse_dir)) == _vals(wh)
