"""Incremental NDV sketch ledger (functions/sketch.py
ndv_sketch_rows / update_ndv_sketches / ndv_estimates): mergeable
HLL state persisted in the warehouse, so distinct-value profiling
never rescans the corpus."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.sketch import (
    ndv_estimates,
    ndv_sketch_rows,
    update_ndv_sketches,
)
from pg_auto_dw_spark.warehouse import Warehouse


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 97).alias("user_id"),
        (F.col("id") % 11).alias("event_type"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 401).cast("string")))
        .alias("session"),
    )


def test_single_pass_estimates_accurate(spark):
    est = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(
            ndv_sketch_rows(_batch(spark, 0, 5000),
                            ["user_id", "event_type", "session"])
        ).collect()
    }
    assert est["event_type"] == 11
    assert est["user_id"] == pytest.approx(97, rel=0.05)
    assert est["session"] == pytest.approx(401, rel=0.05)


def test_incremental_equals_full_scan(spark, tmp_path):
    """Merging per-batch sketches must estimate the SAME NDV as one
    sketch over the concatenated data -- the mergeability contract
    that makes the ledger sound."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    cols = ["user_id", "event_type", "session"]
    for lo, hi in ((0, 2000), (2000, 3500), (3500, 5000)):
        update_ndv_sketches(wh, "prof.ndv", _batch(spark, lo, hi), cols)
    inc = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(wh.read("prof.ndv")).collect()
    }
    full = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(
            ndv_sketch_rows(_batch(spark, 0, 5000), cols)
        ).collect()
    }
    assert inc == full


def test_replay_is_idempotent(spark, tmp_path):
    """Register-max merge: re-merging the same batch changes no
    estimate, so the ledger composes with at-least-once ingest."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    cols = ["user_id", "event_type"]
    update_ndv_sketches(wh, "prof.ndv", _batch(spark, 0, 3000), cols)
    before = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(wh.read("prof.ndv")).collect()
    }
    update_ndv_sketches(wh, "prof.ndv", _batch(spark, 0, 3000), cols)
    after = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(wh.read("prof.ndv")).collect()
    }
    assert before == after


def test_nulls_excluded_and_empty_cols_rejected(spark):
    nulls_only = _batch(spark, 0, 50).select(
        F.lit(None).cast("string").alias("session")
    )
    rows = ndv_sketch_rows(nulls_only, ["session"]).collect()
    assert rows == []  # all-NULL column yields no sketch row
    with pytest.raises(ValueError, match="at least one column"):
        ndv_sketch_rows(_batch(spark, 0, 10), [])


def test_landing_zone_maintains_ndv(spark, tmp_path):
    """Composition: the digest-dedup JSONL landing zone with ndv_cols
    keeps <corpus>.ndv current across micro-batches, and the estimates
    match a direct sketch over the typed corpus."""
    import json as _json

    from pg_auto_dw_spark.streaming.jobs import jsonl_dedup_ingest_stream
    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    lines = [
        _json.dumps({"doc_id": i, "text": f"text {i % 7}", "lang": f"l{i % 3}"})
        for i in range(40)
    ]
    (src / "a.jsonl").write_text("\n".join(lines[:25]) + "\n")
    (src / "b.jsonl").write_text("\n".join(lines[25:]) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = jsonl_dedup_ingest_stream(
        spark, str(src), schema, wh, "c.docs", "c.quarantine",
        str(tmp_path / "ckpt"), ndv_cols=["text", "lang"],
    )
    q.awaitTermination()
    est = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(wh.read("c.docs.ndv")).collect()
    }
    assert est == {"text": 7, "lang": 3}


def test_grouped_ndv_sketches(spark, tmp_path):
    """keys= gives per-group NDV (per-source distinct users) in the
    same one-melt pass, mergeable per group across batches."""
    df = _batch(spark, 0, 4000).withColumn(
        "src", (F.col("user_id") % 2).cast("string")
    )
    direct = {
        (r["src"], r["col_name"]): r["n_distinct"]
        for r in ndv_estimates(
            ndv_sketch_rows(df, ["user_id", "event_type"], keys=["src"])
        ).collect()
    }
    # 97 users split by parity: 49 even, 48 odd; 11 event types in both
    assert direct[("0", "user_id")] == 49
    assert direct[("1", "user_id")] == 48
    assert direct[("0", "event_type")] == 11
    wh = Warehouse(spark, str(tmp_path / "wh"))
    update_ndv_sketches(wh, "p.ndv", df.filter(F.col("user_id") < 50),
                        ["user_id"], keys=["src"])
    update_ndv_sketches(wh, "p.ndv", df.filter(F.col("user_id") >= 50),
                        ["user_id"], keys=["src"])
    inc = {
        (r["src"], r["col_name"]): r["n_distinct"]
        for r in ndv_estimates(wh.read("p.ndv")).collect()
    }
    assert inc[("0", "user_id")] == 49 and inc[("1", "user_id")] == 48


def test_per_stream_sidecars_union_read(spark, tmp_path):
    """The documented single-writer pattern made executable (r12,
    closing the r11 ADVICE loop): two landing-zone streams own
    SEPARATE sidecar tables; a read-time unionByName re-merged through
    the idempotent register-max aggregation estimates the SAME NDV as
    one writer seeing all the data -- so per-stream ownership loses
    nothing while deleting the lost-update race."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    cols = ["user_id", "event_type", "session"]
    # stream A and stream B ingest disjoint halves into their OWN tables
    update_ndv_sketches(wh, "prof.a.ndv", _batch(spark, 0, 2500), cols)
    update_ndv_sketches(wh, "prof.a.ndv", _batch(spark, 2500, 3000), cols)
    update_ndv_sketches(wh, "prof.b.ndv", _batch(spark, 3000, 5000), cols)
    merged = (
        wh.read("prof.a.ndv")
        .unionByName(wh.read("prof.b.ndv"))
        .groupBy("col_name")
        .agg(F.hll_union_agg("sketch", F.lit(True)).alias("sketch"))
    )
    union_est = {
        r["col_name"]: r["n_distinct"] for r in ndv_estimates(merged).collect()
    }
    single = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(
            ndv_sketch_rows(_batch(spark, 0, 5000), cols)
        ).collect()
    }
    assert union_est == single
