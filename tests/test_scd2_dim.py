"""Data-scale partitioned SCD2 merge (build/scd2_dim.py): reference
change/resurrect/insert semantics (queries.rs:221-321) applied to a
bucket-partitioned dimension, with the write pruned to touched
partitions only."""

import datetime
import hashlib
import os

from pyspark.sql import functions as F

from pg_auto_dw_spark.build.scd2_dim import initial_load, merge_batch
from pg_auto_dw_spark.sources import load_table
from pg_auto_dw_spark.warehouse import Warehouse

EARLIER = datetime.datetime(2024, 1, 1)
AS_OF = datetime.datetime(2024, 6, 1)
TRACKED = ["c_name", "c_acctbal", "c_mktsegment"]


def _dim_source(spark, sf_dir, n_buckets=8):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        *TRACKED,
        F.pmod(F.col("c_custkey").cast("long"), F.lit(n_buckets)).cast("long").alias(
            "key_bucket"
        ),
    )


def _partition_state(table_dir):
    """{bucket_dir: {filename: md5}} for every partition directory."""
    state = {}
    for entry in sorted(os.listdir(table_dir)):
        p = os.path.join(table_dir, entry)
        if not (os.path.isdir(p) and entry.startswith("key_bucket=")):
            continue
        files = {}
        for f in sorted(os.listdir(p)):
            with open(os.path.join(p, f), "rb") as fh:
                files[f] = hashlib.md5(fh.read()).hexdigest()
        state[entry] = files
    return state


def test_merge_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """After a merge whose batch touches buckets {1, 5}, every other
    partition's files are byte-identical (same names, same content) --
    the r3 VERDICT done-criterion for scd2_partitioned_merge."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _dim_source(spark, sf_dir)
    initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)
    before = _partition_state(wh.path("dim.customer"))
    assert len(before) == 8  # all buckets populated

    batch = src.filter(F.col("key_bucket").isin(1, 5)).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1.0
    )
    counts = merge_batch(
        wh, "dim.customer", batch, ["c_custkey"], TRACKED, as_of=AS_OF
    )
    assert counts["touched_buckets"] == 2

    # the merge committed a new copy-on-write generation: re-resolve
    after = _partition_state(wh.path("dim.customer"))
    assert set(after) == set(before)
    for bucket, files in before.items():
        if bucket in ("key_bucket=1", "key_bucket=5"):
            assert after[bucket] != files  # rewritten
        else:
            assert after[bucket] == files  # byte-identical

    # semantics: every key in a touched bucket was changed -> closed old
    # version + new current version with the bumped balance
    final = wh.read("dim.customer")
    touched = final.filter(F.col("key_bucket").isin(1, 5))
    n_keys = batch.count()
    assert touched.filter(F.col("current_flag") == "N").count() == n_keys
    cur = touched.filter(F.col("current_flag") == "Y")
    assert cur.count() == n_keys
    sample_key = batch.select("c_custkey").first()[0]
    old_bal = src.filter(F.col("c_custkey") == sample_key).first()["c_acctbal"]
    versions = final.filter(F.col("c_custkey") == sample_key).collect()
    by_flag = {r["current_flag"]: r for r in versions}
    assert by_flag["Y"]["c_acctbal"] == old_bal + 1.0
    assert by_flag["N"]["c_acctbal"] == old_bal
    assert by_flag["N"]["valid_to"] is not None and by_flag["Y"]["valid_to"] is None


def test_merge_scan_prunes_untouched_partitions(spark, sf_dir, tmp_path):
    """The merge's target scan must filter on the touched bucket set so
    Catalyst partition-prunes the file listing (scale contract: a batch
    touching 2 partitions of 10^4 never reads the other 9,998)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _dim_source(spark, sf_dir)
    initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)
    touched = [r[0] for r in src.filter(F.col("key_bucket").isin(1, 5)).select("key_bucket").distinct().collect()]
    pruned = wh.read("dim.customer").filter(F.col("key_bucket").isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters appear as PartitionFilters on the scan node
    assert "PartitionFilters" in plan
    assert pruned.count() == src.filter(F.col("key_bucket").isin(1, 5)).count()


def test_merge_idempotent_and_unchanged_noop(spark, sf_dir, tmp_path):
    """Re-presenting identical rows is a no-op (no new versions); the
    changed-batch merge re-run is idempotent (anti-join altitude,
    dv_loader.rs:177-181)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _dim_source(spark, sf_dir)
    initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)
    batch = src.filter(F.col("key_bucket") == 2)
    merge_batch(wh, "dim.customer", batch, ["c_custkey"], TRACKED, as_of=AS_OF)
    n1 = wh.read("dim.customer").count()
    assert n1 == src.count()  # unchanged re-present: nothing inserted
    changed = batch.withColumn("c_acctbal", F.col("c_acctbal") * 2)
    merge_batch(wh, "dim.customer", changed, ["c_custkey"], TRACKED, as_of=AS_OF)
    n2 = wh.read("dim.customer").count()
    merge_batch(wh, "dim.customer", changed, ["c_custkey"], TRACKED, as_of=AS_OF)
    assert wh.read("dim.customer").count() == n2  # second identical merge: no-op


def _dim_state(wh, table="dim.customer"):
    return sorted(
        (
            r["c_custkey"],
            r["c_name"],
            r["c_acctbal"],
            r["c_mktsegment"],
            r["current_flag"],
            r["deleted_flag"],
            r["valid_to"] is not None,
        )
        for r in wh.read(table).collect()
    )


def test_scd2_dim_stream_matches_batch_and_replays_noop(spark, sf_dir, tmp_path):
    """The streaming CDC merge (foreachBatch -> merge_batch) must land
    the identical dimension state as driving the batch merge directly,
    apply each micro-batch exactly once across restarts, and be a
    no-op under full re-delivery (at-least-once -> exactly-once
    effects)."""
    from pg_auto_dw_spark.build.scd2_dim import initial_load, merge_batch, with_bucket
    from pg_auto_dw_spark.streaming.jobs import scd2_dim_stream

    raw = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"), *TRACKED
    )
    src = with_bucket(raw, ["c_custkey"], 16)
    wh_stream = Warehouse(spark, str(tmp_path / "wh_stream"))
    wh_batch = Warehouse(spark, str(tmp_path / "wh_batch"))
    for wh in (wh_stream, wh_batch):
        initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)

    feed = tmp_path / "cdc_feed"
    feed.mkdir()
    batch1 = raw.filter(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 5.0
    )
    batch1.write.mode("append").parquet(str(feed))

    ckpt = str(tmp_path / "ckpt")
    kwargs = dict(
        source_schema=raw.schema,
        key_cols=["c_custkey"],
        tracked_cols=TRACKED,
        n_buckets=16,
        as_of=AS_OF,
    )
    q = scd2_dim_stream(
        spark, wh_stream, "dim.customer", str(feed), checkpoint_dir=ckpt, **kwargs
    )
    q.awaitTermination(120)
    merge_batch(
        wh_batch, "dim.customer", with_bucket(batch1, ["c_custkey"], 16),
        ["c_custkey"], TRACKED, as_of=AS_OF,
    )
    assert _dim_state(wh_stream) == _dim_state(wh_batch)

    # second delivery: brand-new keys; restart from the same checkpoint
    # applies ONLY the new file
    batch2 = raw.filter(F.col("c_custkey") % 7 == 1).withColumn(
        "c_custkey", F.col("c_custkey") + 5_000_000
    )
    batch2.write.mode("append").parquet(str(feed))
    q2 = scd2_dim_stream(
        spark, wh_stream, "dim.customer", str(feed), checkpoint_dir=ckpt, **kwargs
    )
    q2.awaitTermination(120)
    merge_batch(
        wh_batch, "dim.customer", with_bucket(batch2, ["c_custkey"], 16),
        ["c_custkey"], TRACKED, as_of=AS_OF,
    )
    assert _dim_state(wh_stream) == _dim_state(wh_batch)

    # full re-delivery: a FRESH checkpoint replays every file; the merge
    # semantics make re-application a structural no-op
    q3 = scd2_dim_stream(
        spark, wh_stream, "dim.customer", str(feed),
        checkpoint_dir=str(tmp_path / "ckpt_replay"), **kwargs
    )
    q3.awaitTermination(120)
    assert _dim_state(wh_stream) == _dim_state(wh_batch)


def test_merge_composite_key_dimension(spark, sf_dir, tmp_path):
    """Multi-column business keys: the merge joins, buckets, and
    anti-joins on the full key tuple (lineitem-style composite grain)."""
    from pg_auto_dw_spark.build.scd2_dim import initial_load, merge_batch, with_bucket

    # (l_orderkey, l_linenumber) is not unique in the synthetic lineitem;
    # a dimension is key-grain, so aggregate to one deterministic row per
    # composite key (MAX is order-independent).
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .groupBy(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
        )
        .agg(
            F.max(F.col("l_quantity").cast("double")).alias("l_quantity"),
            F.max("l_returnflag").alias("l_returnflag"),
        )
    )
    keys = ["l_orderkey", "l_linenumber"]
    tracked = ["l_quantity", "l_returnflag"]
    src = with_bucket(li, keys, 8)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    initial_load(wh, "dim.li", src, keys, tracked, as_of=EARLIER)
    n0 = wh.read("dim.li").count()

    # change quantity for linenumber 1 rows; re-present linenumber 2 unchanged
    batch = src.filter(F.col("l_linenumber").isin(1, 2)).withColumn(
        "l_quantity",
        F.when(F.col("l_linenumber") == 1, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    counts = merge_batch(wh, "dim.li", batch, keys, tracked, as_of=AS_OF)
    final = wh.read("dim.li")
    n_changed = batch.filter(F.col("l_linenumber") == 1).count()
    assert final.count() == n0 + n_changed  # one new version per changed key
    assert final.filter(F.col("current_flag") == "N").count() == n_changed
    # composite key integrity: exactly one current row per (orderkey, line)
    dup = (
        final.filter(F.col("current_flag") == "Y")
        .groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    assert counts["closed_total"] == n_changed


def test_merge_resurrect_and_full_snapshot_delete(spark, sf_dir, tmp_path):
    """Deleted keys re-presented unchanged resurrect (P7); with
    full_snapshot=True, keys absent from a touched bucket's batch are
    flagged deleted (per-bucket completeness -- keys cannot change
    bucket)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _dim_source(spark, sf_dir)
    initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)
    bucket3 = src.filter(F.col("key_bucket") == 3)
    keys = sorted(r[0] for r in bucket3.select("c_custkey").collect())
    half = keys[: len(keys) // 2]
    # full snapshot of bucket 3 containing only the first half
    merge_batch(
        wh,
        "dim.customer",
        bucket3.filter(F.col("c_custkey").isin(half)),
        ["c_custkey"],
        TRACKED,
        as_of=AS_OF,
        full_snapshot=True,
    )
    final = wh.read("dim.customer").filter(F.col("key_bucket") == 3)
    deleted = {r[0] for r in final.filter(F.col("deleted_flag") == "Y").select("c_custkey").collect()}
    assert deleted == set(keys) - set(half)
    # other buckets untouched by the full-snapshot semantics
    assert wh.read("dim.customer").filter(
        (F.col("key_bucket") != 3) & (F.col("deleted_flag") == "Y")
    ).count() == 0
    # resurrect: re-present the deleted half unchanged
    merge_batch(
        wh,
        "dim.customer",
        bucket3.filter(~F.col("c_custkey").isin(half)),
        ["c_custkey"],
        TRACKED,
        as_of=AS_OF,
    )
    assert wh.read("dim.customer").filter(F.col("deleted_flag") == "Y").count() == 0


def test_scd2_dim_stream_collapses_multi_version_batch(spark, sf_dir, tmp_path):
    """A CDC micro-batch carrying TWO versions of one key (the normal
    two-updates-within-one-trigger case) must merge as ONE latest
    version: exactly one current row per key afterwards, valued at the
    later version; the intermediate version is collapsed (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_auto_dw_spark.build.scd2_dim import initial_load, with_bucket
    from pg_auto_dw_spark.streaming.jobs import scd2_dim_stream

    raw = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"), *TRACKED
    )
    src = with_bucket(raw, ["c_custkey"], 8)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)

    base = raw.filter(F.col("c_custkey").isin(11, 12)).collect()
    by_key = {r["c_custkey"]: r for r in base}
    rows = []
    for k in (11, 12):
        r = by_key[k]
        # version A then version B, in row order within ONE file:
        # row_index is the arrival-order tiebreak, so B must win
        rows.append((k, r["c_name"], r["c_acctbal"] + 1.0, r["c_mktsegment"]))
        rows.append((k, r["c_name"], r["c_acctbal"] + 2.0, r["c_mktsegment"]))
    feed = tmp_path / "cdc_feed"
    feed.mkdir()
    table = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array([r[1] for r in rows], pa.string()),
            "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
            "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(feed / "batch-0.parquet"))

    q = scd2_dim_stream(
        spark,
        wh,
        "dim.customer",
        str(feed),
        source_schema=raw.schema,
        key_cols=["c_custkey"],
        tracked_cols=TRACKED,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=8,
        as_of=AS_OF,
    )
    q.awaitTermination(120)

    for k in (11, 12):
        versions = wh.read("dim.customer").filter(F.col("c_custkey") == k).collect()
        cur = [r for r in versions if r["current_flag"] == "Y"]
        assert len(cur) == 1, f"key {k}: single-current-row invariant broken"
        assert cur[0]["c_acctbal"] == by_key[k]["c_acctbal"] + 2.0  # latest wins
        # exactly one closure (the initial version); intermediate +1.0
        # version never recorded
        assert len(versions) == 2
        bals = {r["c_acctbal"] for r in versions}
        assert by_key[k]["c_acctbal"] + 1.0 not in bals


def test_closed_total_counts_only_this_merge(spark, sf_dir, tmp_path):
    """closed_total must count rows closed BY THIS merge, not all
    noncurrent rows carried through the rewritten partitions
    (ADVICE r4: after the first merge into a table with history the
    old figure was wrong)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = _dim_source(spark, sf_dir)
    initial_load(wh, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)
    batch = src.filter(F.col("key_bucket") == 2)
    n_keys = batch.count()

    c1 = merge_batch(
        wh, "dim.customer",
        batch.withColumn("c_acctbal", F.col("c_acctbal") + 1.0),
        ["c_custkey"], TRACKED, as_of=AS_OF,
    )
    assert c1["closed_total"] == n_keys
    # second merge over the same keys: history now exists in the
    # touched partitions; closed_total must still be n_keys, not 2x
    c2 = merge_batch(
        wh, "dim.customer",
        batch.withColumn("c_acctbal", F.col("c_acctbal") + 2.0),
        ["c_custkey"], TRACKED, as_of=datetime.datetime(2024, 7, 1),
    )
    assert c2["closed_total"] == n_keys
    # and an unchanged re-present closes nothing
    c3 = merge_batch(
        wh, "dim.customer",
        batch.withColumn("c_acctbal", F.col("c_acctbal") + 2.0),
        ["c_custkey"], TRACKED, as_of=datetime.datetime(2024, 8, 1),
    )
    assert c3["closed_total"] == 0


def test_file_granular_merge_preserves_untouched_files(spark, sf_dir, tmp_path):
    """r4 VERDICT directive 4: within a touched bucket, only files
    whose footer key range intersects the batch are rewritten; the
    other files survive byte-identical (same name, same content), and
    the merged state equals the partition-granular merge's."""
    src_raw = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"), *TRACKED
    )
    # ONE bucket, four range-clustered files: repartitionByRange gives
    # each writer task a disjoint c_custkey range
    src = src_raw.repartitionByRange(4, "c_custkey").withColumn(
        "key_bucket", F.lit(0).cast("long")
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    for w in (wh, wh_ref):
        initial_load(w, "dim.customer", src, ["c_custkey"], TRACKED, as_of=EARLIER)
    bucket_dir = os.path.join(wh.path("dim.customer"), "key_bucket=0")
    files_before = {
        f: hashlib.md5(open(os.path.join(bucket_dir, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(bucket_dir))
        if f.endswith(".parquet")
    }
    assert len(files_before) == 4

    # batch touches only the lowest key range
    lo_keys = [r[0] for r in src.select("c_custkey").orderBy("c_custkey").limit(20).collect()]
    batch = src.filter(F.col("c_custkey").isin(lo_keys)).withColumn(
        "c_acctbal", F.col("c_acctbal") + 9.0
    )
    counts = merge_batch(wh, "dim.customer", batch, ["c_custkey"], TRACKED, as_of=AS_OF)
    assert counts["files_rewritten"] >= 1
    assert counts["files_preserved_in_touched"] >= 2  # range-disjoint files skipped
    assert counts["closed_total"] == len(lo_keys)

    bucket_dir_after = os.path.join(wh.path("dim.customer"), "key_bucket=0")
    files_after = {
        f: hashlib.md5(open(os.path.join(bucket_dir_after, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(bucket_dir_after))
        if f.endswith(".parquet")
    }
    preserved = set(files_before) & set(files_after)
    identical = {f for f in preserved if files_before[f] == files_after[f]}
    assert len(identical) == counts["files_preserved_in_touched"]

    # state parity with the partition-granular merge
    merge_batch(
        wh_ref, "dim.customer", batch, ["c_custkey"], TRACKED, as_of=AS_OF,
        file_prune=False,
    )
    assert _dim_state(wh) == _dim_state(wh_ref)

    # idempotent re-run through the pruned path: no new versions
    n = wh.read("dim.customer").count()
    merge_batch(wh, "dim.customer", batch, ["c_custkey"], TRACKED, as_of=AS_OF)
    assert wh.read("dim.customer").count() == n
