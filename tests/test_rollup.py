"""Incremental rollup maintenance: batch-folding parity with a full
recompute, partition-pruned refresh (untouched partitions stay
byte-identical), and derived averages."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.build.rollup import IncrementalRollup
from pg_auto_dw_spark.sources import load_table
from pg_auto_dw_spark.warehouse import Warehouse

METRICS = [
    ("count", "value", "n_events"),
    ("sum", "value", "value_sum"),
    ("min", "value", "value_min"),
    ("max", "value", "value_max"),
]


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value", "ts", "event_id"
    )


def _expected(df):
    return {
        (str(r.day), r.event_type): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("day", "event_type")
        .agg(
            F.count("value").alias("n"), F.sum("value").alias("s"),
            F.min("value").alias("mn"), F.max("value").alias("mx"),
        )
        .collect()
    }


def _got(roll):
    return {
        (str(r.day), r.event_type): (r.n_events, r.value_sum, r.value_min, r.value_max)
        for r in roll.read().collect()
    }


def _close(a, b):
    assert a[0] == b[0] and a[2] == b[2] and a[3] == b[3]
    assert abs(a[1] - b[1]) < 1e-9 * max(1.0, abs(b[1]))


def test_incremental_matches_full_recompute(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir).cache()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    roll = IncrementalRollup(
        wh, "daily_rollup", ["day", "event_type"], "day", METRICS,
        avg_of=[("value_sum", "n_events", "value_avg")],
    )
    # bootstrap on the first third, then fold two batches
    first = ev.filter(F.col("event_id") % 3 == 0)
    b2 = ev.filter(F.col("event_id") % 3 == 1)
    b3 = ev.filter(F.col("event_id") % 3 == 2)
    roll.init(first)
    roll.apply_batch(b2)
    roll.apply_batch(b3)
    got, want = _got(roll), _expected(ev)
    assert set(got) == set(want)
    for k in want:
        _close(got[k], want[k])
    # derived average exists and is sum/count
    r0 = roll.read().limit(1).collect()[0]
    assert abs(r0.value_avg - r0.value_sum / r0.n_events) < 1e-12


def test_batch_touches_only_its_partitions(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir).cache()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    roll = IncrementalRollup(
        wh, "daily_rollup", ["day", "event_type"], "day", METRICS
    )
    roll.init(ev)
    import os

    live = wh.path("daily_rollup")
    target_day = sorted(
        d for d in os.listdir(live) if d.startswith("day=")
    )[0]
    before = {
        d: sorted(os.listdir(os.path.join(live, d)))
        for d in os.listdir(live)
        if d.startswith("day=")
    }
    one_day = target_day.split("=", 1)[1]
    batch = ev.filter(F.col("day") == one_day).limit(50)
    assert batch.count() > 0
    roll.apply_batch(batch)
    live2 = wh.path("daily_rollup")
    after = {
        d: sorted(os.listdir(os.path.join(live2, d)))
        for d in os.listdir(live2)
        if d.startswith("day=")
    }
    changed = [d for d in before if before[d] != after.get(d)]
    # hardlinked untouched partitions keep identical file lists; only
    # the batch's day partition is rewritten
    assert changed == [target_day]


def test_rejects_bad_specs(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError):
        IncrementalRollup(wh, "x", ["a"], "day", METRICS)
    with pytest.raises(ValueError):
        IncrementalRollup(wh, "x", ["day"], "day", [("median", "v", "m")])


def test_rollup_stream_exactly_once_across_restart(spark, sf_dir, tmp_path):
    """Stream-driven maintenance: catch-up run folds everything once;
    a restart over the same directory folds nothing twice; new files
    fold incrementally."""
    import os as _os
    import shutil

    from pg_auto_dw_spark.streaming.jobs import rollup_stream

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(
        _os.path.join(sf_dir, "events.parquet"), events_dir / "part-0.parquet"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    roll = IncrementalRollup(
        wh, "daily_rollup", ["day", "event_type"], "day", METRICS
    )
    # start empty: bootstrap with an empty slice of the source schema
    full = _events(spark, sf_dir)
    roll.init(full.filter(F.lit(False)))

    def prep(df):
        return df.select(
            F.to_date("ts").alias("day"), "event_type", "value", "ts", "event_id"
        )

    q = rollup_stream(spark, str(events_dir), str(tmp_path / "ckpt"), roll, prep)
    q.awaitTermination(120)
    got, want = _got(roll), _expected(full)
    assert set(got) == set(want)
    for k in want:
        _close(got[k], want[k])

    # restart: nothing re-folds
    q2 = rollup_stream(spark, str(events_dir), str(tmp_path / "ckpt"), roll, prep)
    q2.awaitTermination(120)
    got2 = _got(roll)
    for k in want:
        _close(got2[k], want[k])

    # new data folds in
    extra = full.limit(500)
    extra.write.mode("append").parquet(str(events_dir))
    q3 = rollup_stream(spark, str(events_dir), str(tmp_path / "ckpt"), roll, prep)
    q3.awaitTermination(120)
    got3 = _got(roll)
    want3 = _expected(full.unionByName(extra))
    assert set(got3) == set(want3)
    for k in want3:
        _close(got3[k], want3[k])


def test_cube_matches_union_of_groupings(spark, sf_dir):
    """CUBE(type, day) = one Catalyst Expand pass producing all four
    grouping combinations (the single-shuffle property the retired
    events_cube_type_day oracle row pinned; Expand itself stays
    oracle-covered by events_rollup_hierarchy)."""
    ev = _events(spark, sf_dir)
    cube = {
        (r.event_type, None if r.day is None else str(r.day)): (r.n, r.s)
        for r in ev.cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    want = {}
    for keys in ([], ["event_type"], ["day"], ["event_type", "day"]):
        agg = ev.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        )
        for r in agg.collect():
            k = (
                r.event_type if "event_type" in keys else None,
                str(r.day) if "day" in keys and r.day is not None else None,
            )
            want[k] = (r.n, r.s)
    assert cube == want


def test_exact_median_interpolation(spark, sf_dir):
    """F.median interpolates at even group sizes (the retired
    events_value_median_by_type row's contract); checked against a
    driver-side sort of one group."""
    ev = _events(spark, sf_dir)
    got = {
        r.event_type: r.m
        for r in ev.groupBy("event_type").agg(F.median("value").alias("m")).collect()
    }
    vals = sorted(v.value for v in ev.filter(F.col("event_type") == "click").collect())
    n = len(vals)
    want = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2.0
    assert got["click"] == pytest.approx(want, abs=1e-9)
