"""Structured Streaming jobs: availableNow rollup, streaming hub load
idempotency across restarts, and the polling worker loop."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.sources import load_table
from pg_auto_dw_spark.streaming.jobs import (
    events_stream_rollup,
    incremental_hub_stream,
    run_polling_worker,
)


def test_polling_worker_runs_and_sleeps():
    ticks = []
    slept = []
    run_polling_worker(lambda: ticks.append(1), iterations=3, sleep=slept.append)
    assert len(ticks) == 3
    assert slept == [10.0, 10.0]


def test_events_stream_rollup_matches_batch(spark, sf_dir, tmp_path):
    # file stream sources require a directory
    import shutil

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), events_dir / "part-0.parquet")
    q = events_stream_rollup(
        spark,
        str(events_dir),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    batch = load_table(spark, sf_dir, "events").groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch rollup exactly
    j = out.join(batch, ["window_start", "event_type"], "inner")
    assert out.count() > 0
    assert (
        j.filter(out["n_events"] != batch["n_events"]).count() == 0
    )
    assert j.count() == out.count()


def test_incremental_hub_stream_exactly_once(spark, sf_dir, tmp_path):
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    src = str(tmp_path / "src")
    customer = load_table(spark, sf_dir, "customer")
    customer.write.parquet(src)
    n = customer.count()

    kwargs = dict(
        source_schema=schema,
        key_cols=["c_custkey"],
        checkpoint_dir=str(tmp_path / "ckpt2"),
        output_dir=str(tmp_path / "hub"),
    )
    q = incremental_hub_stream(spark, src, **kwargs)
    q.awaitTermination(120)
    hub = spark.read.parquet(str(tmp_path / "hub"))
    assert hub.count() == n
    assert hub.select("hub_hk").distinct().count() == n

    # restart with the same checkpoint: nothing new -> no duplicates
    q2 = incremental_hub_stream(spark, src, **kwargs)
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "hub")).count() == n
