"""Type-1 upsert and targeted (GDPR-shape) deletion over the Warehouse.

Complements test_scd2_dim.py (versioned merge): these are the
un-versioned MERGE / DELETE verbs, with partition- and file-granular
rewrite proofs (untouched files byte-identical across the commit).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.build.merge import delete_keys, merge_upsert
from pg_auto_dw_spark.warehouse import Warehouse

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("b", T.LongType()),
    ]
)


def _rows(wh, name):
    return {(r["k"], r["v"], r["b"]) for r in wh.read(name).collect()}


def _mk(spark, pairs):
    return spark.createDataFrame([(k, v, k % 4) for k, v in pairs], SCHEMA)


@pytest.fixture()
def wh(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.d", SCHEMA, partition_by=["b"])
    wh.append("m.d", _mk(spark, [(i, f"old{i}") for i in range(12)]))
    return wh


def test_upsert_updates_matched_inserts_new_carries_rest(spark, wh):
    batch = _mk(spark, [(0, "NEW0"), (4, "NEW4"), (100, "NEW100")])  # all b=0
    stats = merge_upsert(wh, "m.d", batch, key_cols=["k"])
    assert stats["matched"] == 2 and stats["inserted"] == 1
    assert stats["touched_partitions"] == [(0,)]
    got = _rows(wh, "m.d")
    assert (0, "NEW0", 0) in got and (4, "NEW4", 0) in got and (100, "NEW100", 0) in got
    assert (8, "old8", 0) in got  # same partition, unmatched key -> carried
    assert (1, "old1", 1) in got  # untouched partition


def test_upsert_null_partition_carries_unmatched_rows(spark, wh):
    """A batch row landing in the NULL partition must not wipe the
    partition's unmatched current rows: the touched-partition filter
    has to be null-safe (r5 review finding -- isin/== never match NULL,
    so the carry set silently excluded the null partition while the
    dynamic overwrite still replaced it)."""
    wh.append(
        "m.d",
        spark.createDataFrame(
            [(200, "n200", None), (201, "n201", None), (202, "n202", None)],
            SCHEMA,
        ),
    )
    batch = spark.createDataFrame([(200, "NEW200", None)], SCHEMA)
    stats = merge_upsert(wh, "m.d", batch, key_cols=["k"])
    assert stats["matched"] == 1 and stats["inserted"] == 0
    assert stats["carried"] == 2
    got = _rows(wh, "m.d")
    assert (200, "NEW200", None) in got
    assert (201, "n201", None) in got and (202, "n202", None) in got
    assert (0, "old0", 0) in got  # non-null partitions untouched


def test_upsert_null_partition_contract_check_sees_null_rows(spark, wh):
    """verify_partition_contract must catch a batch key whose current
    row lives in the NULL partition while the batch places it
    elsewhere (the negated filter was null-blind pre-fix)."""
    wh.append(
        "m.d",
        spark.createDataFrame([(300, "n300", None)], SCHEMA),
    )
    moved = spark.createDataFrame([(300, "MOVED", 2)], SCHEMA)
    with pytest.raises(ValueError, match="partition contract"):
        merge_upsert(
            wh, "m.d", moved, key_cols=["k"], verify_partition_contract=True
        )


def test_delete_keys_typed_from_table_schema(spark, warehouse_dir):
    """Key literals must take the TABLE's column type: a date key used
    to be sniffed as double (isinstance fallthrough) and die or
    mismatch inside createDataFrame (r5 review finding)."""
    import datetime

    schema = T.StructType(
        [T.StructField("d", T.DateType()), T.StructField("v", T.StringType())]
    )
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.dates", schema)
    rows = [
        (datetime.date(2024, 1, i + 1), f"v{i}") for i in range(6)
    ]
    wh.append("m.dates", spark.createDataFrame(rows, schema))
    victims = spark.createDataFrame(
        [(datetime.date(2024, 1, 2),), (datetime.date(2024, 1, 5),)],
        T.StructType([T.StructField("d", T.DateType())]),
    )
    stats = delete_keys(wh, "m.dates", victims, key_col="d")
    assert stats["rows_deleted"] == 2
    left = {r["d"] for r in wh.read("m.dates").collect()}
    assert datetime.date(2024, 1, 2) not in left and len(left) == 4


def test_delete_keys_unknown_column_raises(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.k", SCHEMA)
    wh.append("m.k", _mk(spark, [(1, "a")]))
    victims = spark.createDataFrame([(1,)], "nope bigint")
    with pytest.raises(ValueError, match="not in table"):
        delete_keys(wh, "m.k", victims, key_col="nope")


def test_upsert_untouched_partition_files_not_rewritten(spark, wh):
    before = {
        rel: os.stat(os.path.join(wh.path("m.d"), rel)).st_ino
        for rel in wh.data_files("m.d")
        if rel.startswith("b=1")
    }
    merge_upsert(wh, "m.d", _mk(spark, [(0, "X0")]), key_cols=["k"])
    after = {
        rel: os.stat(os.path.join(wh.path("m.d"), rel)).st_ino
        for rel in wh.data_files("m.d")
        if rel.startswith("b=1")
    }
    assert before and before == after  # hardlinked through, byte-identical


def test_upsert_duplicate_batch_keys_rejected_without_order_col(spark, wh):
    batch = _mk(spark, [(0, "A"), (0, "B")])
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(wh, "m.d", batch, key_cols=["k"])


def test_upsert_order_col_keeps_newest_version(spark, wh):
    schema = T.StructType(SCHEMA.fields + [T.StructField("seq", T.LongType())])
    batch = spark.createDataFrame([(0, "v1", 0, 1), (0, "v2", 0, 2)], schema)
    stats = merge_upsert(wh, "m.d", batch.select("k", "v", "b", "seq"), ["k"], order_col="seq")
    assert stats["matched"] == 1 and stats["inserted"] == 0
    assert (0, "v2", 0) in {(r["k"], r["v"], r["b"]) for r in wh.read("m.d").collect()}


def test_delete_keys_removes_rows_and_prunes_clean_files(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA, partition_by=["b"])
    # two files per partition with disjoint key ranges (footer stats
    # separate them): keys 0..39 and 1000..1039
    low = _mk(spark, [(i, f"lo{i}") for i in range(40)]).repartition(1)
    high = _mk(spark, [(i, f"hi{i}") for i in range(1000, 1040)]).repartition(1)
    wh.append("m.t", low)
    wh.append("m.t", high)
    inodes_before = {
        rel: os.stat(os.path.join(wh.path("m.t"), rel)).st_ino
        for rel in wh.data_files("m.t")
    }
    victims = spark.createDataFrame([(3,), (7,), (11,)], "k long")
    stats = delete_keys(wh, "m.t", victims, "k")
    assert stats["rows_deleted"] == 3
    # only low-range files can contain keys 3/7/11 -> high files carried
    assert stats["files_carried"] >= 4  # one high file per partition
    got = {r["k"] for r in wh.read("m.t").collect()}
    assert got == (set(range(40)) - {3, 7, 11}) | set(range(1000, 1040))
    # carried files share inodes with the previous generation's files
    inodes_after = {
        rel: os.stat(os.path.join(wh.path("m.t"), rel)).st_ino
        for rel in wh.data_files("m.t")
    }
    carried = [r for r in inodes_after if r in inodes_before and inodes_after[r] == inodes_before[r]]
    assert len(carried) == stats["files_carried"]


def test_delete_keys_noop_when_no_file_contains_victims(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA, partition_by=["b"])
    wh.append("m.t", _mk(spark, [(i, f"x{i}") for i in range(8)]))
    stats = delete_keys(wh, "m.t", spark.createDataFrame([(999,)], "k long"), "k")
    assert stats == {"rows_deleted": 0, "files_rewritten": 0, "files_carried": len(wh.data_files("m.t"))}


def test_delete_keys_unpartitioned_falls_back_to_full_rewrite(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.u", SCHEMA)
    wh.append("m.u", _mk(spark, [(i, f"x{i}") for i in range(10)]))
    stats = delete_keys(wh, "m.u", spark.createDataFrame([(2,), (5,)], "k long"), "k")
    assert stats["rows_deleted"] == 2
    assert {r["k"] for r in wh.read("m.u").collect()} == set(range(10)) - {2, 5}


def test_delete_keys_oversized_keyset_rejected(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA, partition_by=["b"])
    wh.append("m.t", _mk(spark, [(i, f"x{i}") for i in range(4)]))
    many = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="more than"):
        delete_keys(wh, "m.t", many, "k", max_driver_keys=5)


def test_delete_keys_bucket_fn_prunes_other_partitions(spark, warehouse_dir):
    """Range stats alone cannot place key 17 in bucket 1; with the
    bucket mapping, files in other partitions are provably clean even
    when their key RANGE covers the victim."""
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA, partition_by=["b"])
    # every partition holds keys spanning the full range (k%4 buckets)
    wh.append("m.t", _mk(spark, [(i, f"x{i}") for i in range(400)]).repartition(4))
    victims = spark.createDataFrame([(17,)], "k long")  # 17 % 4 == 1
    blind = delete_keys(wh, "m.t", victims, "k")
    # without the mapping, every partition's covering file is suspect
    assert blind["files_rewritten"] >= 1
    wh2 = Warehouse(spark, warehouse_dir + "_2")
    wh2.create_table("m.t", SCHEMA, partition_by=["b"])
    wh2.append("m.t", _mk(spark, [(i, f"x{i}") for i in range(400)]).repartition(4))
    n_b1 = len([r for r in wh2.data_files("m.t") if r.startswith("b=1")])
    stats = delete_keys(wh2, "m.t", victims, "k", bucket_of=lambda k: k % 4)
    assert stats["rows_deleted"] == 1
    # only b=1 files can be affected under the mapping
    assert stats["files_rewritten"] <= n_b1
    assert {r["k"] for r in wh2.read("m.t").collect()} == set(range(400)) - {17}


def test_template_scratch_clones_are_isolated(spark):
    """Mutating a clone must never leak into the template or a sibling
    clone: parquet files are hardlink-shared (immutable), but sidecar
    meta/pointers are copied, and rewrites create new inodes."""
    from pyspark.sql import types as T

    from pg_auto_dw_spark.queries_catalog import _template_scratch
    from pg_auto_dw_spark.warehouse import Warehouse

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    init = spark.createDataFrame([(1, "a"), (2, "b")], schema)

    def build(d):
        w = Warehouse(spark, d)
        w.create_table("t.x", schema)
        w.append("t.x", init)

    key = (spark.sparkContext.applicationId, "tmpl-isolation-test")
    c1 = Warehouse(spark, _template_scratch(key, "autodw_tmpltest_", build))
    c2 = Warehouse(spark, _template_scratch(key, "autodw_tmpltest_", build))
    c1.overwrite("t.x", spark.createDataFrame([(9, "z")], schema))
    assert {r["k"] for r in c1.read("t.x").collect()} == {9}
    assert {r["k"] for r in c2.read("t.x").collect()} == {1, 2}  # sibling intact
    c3 = Warehouse(spark, _template_scratch(key, "autodw_tmpltest_", build))
    assert {r["k"] for r in c3.read("t.x").collect()} == {1, 2}  # template intact
