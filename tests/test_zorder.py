"""Z-order clustering: interleave correctness vs a Python model, and
the data-skipping payoff -- per-file min-max boxes tight in BOTH
dimensions after a z-ordered write, in neither after a plain write."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.zorder import interleave_bits, zorder_frame, zvalue


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_model(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton(x, y, 4), (x, y)


def test_zvalue_rejects_overflow_and_handles_constants(spark):
    df = spark.createDataFrame([Row(a=1.0, b=5), Row(a=2.0, b=5)])
    with pytest.raises(ValueError):
        zvalue(df, ["a", "b"], bits=32)
    # constant column normalizes to 0; z reduces to the varying column
    z = df.select(zvalue(df, ["a", "b"], bits=8).alias("z")).collect()
    assert len({r.z for r in z}) == 2


def _file_spans(path: str, col: str) -> list[float]:
    import glob

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append(mx - mn)
    return spans


def test_zorder_write_tightens_both_dimensions(spark, tmp_path):
    import random

    rng = random.Random(3)
    rows = [Row(u=rng.randrange(1 << 14), t=rng.randrange(1 << 14)) for _ in range(40000)]
    df = spark.createDataFrame(rows)
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartition(16).write.parquet(plain)
    zorder_frame(df, ["u", "t"], 16).write.parquet(zed)

    full = (1 << 14) - 1
    for col in ("u", "t"):
        plain_avg = sum(_file_spans(plain, col)) / 16
        zed_avg = sum(_file_spans(zed, col)) / 16
        # random layout: every file spans ~the full range; z-order:
        # each dimension's average per-file span shrinks sharply
        assert plain_avg > 0.9 * full, (col, plain_avg)
        assert zed_avg < 0.5 * full, (col, zed_avg)


def test_compact_cluster_by_preserves_data(spark, tmp_path, sf_dir):
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    for _ in range(3):
        wh.append("evz", ev.repartition(5))
    before = wh.read("evz").count()
    stats = wh.compact("evz", target_file_mb=256, cluster_by=["user_id", "value"])
    assert stats["files_after"] < stats["files_before"]
    after = wh.read("evz")
    assert after.count() == before
    assert after.agg(F.sum("event_id")).collect()[0][0] == ev.agg(
        F.sum("event_id")
    ).collect()[0][0] * 3


def test_read_pruned_skips_files_on_zordered_table(spark, tmp_path):
    import random

    from pg_auto_dw_spark.warehouse import Warehouse

    rng = random.Random(11)
    rows = [Row(u=rng.randrange(10000), v=rng.randrange(10000)) for _ in range(30000)]
    df = spark.createDataFrame(rows)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append("pts", df.repartition(16))
    # data is < 1 MB so compact() would rightly make ONE file; force a
    # 16-file z-ordered layout to exercise pruning
    from pg_auto_dw_spark.functions.zorder import zorder_frame

    wh.overwrite("pts", zorder_frame(wh.read("pts"), ["u", "v"], 16))
    n_files = len(wh.data_files("pts"))
    assert n_files >= 8

    box = {"u": (1000, 2000), "v": (7000, 8000)}
    kept = wh.prune_files("pts", box)
    # the query box is ~1% of the plane; a z-ordered layout must skip
    # most files
    assert len(kept) < n_files / 2, (len(kept), n_files)
    got = sorted((r.u, r.v) for r in wh.read_pruned("pts", box).collect())
    want = sorted(
        (u, v) for u, v in ((r.u, r.v) for r in rows)
        if 1000 <= u <= 2000 and 7000 <= v <= 8000
    )
    assert got == want
