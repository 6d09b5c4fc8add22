"""Ledger-size scale probe for neardup_ingest_apply: the per-batch
cost must track the ledger SCAN (linear, embarrassingly parallel),
never a ledger shuffle -- the plan shape is pinned in
test_plan_shapes.py; this measures the constant.

Construction: synthetic band/signature sidecars written DIRECTLY at
1x/10x ledger sizes (the apply only ever reads them), then the same
200-doc batch applied against each. 3-rep medians; each rep runs the
full apply (signatures + within-batch collapse + both ledger probes +
transaction) against a FRESH corpus clone so appends don't compound.

Usage: python tools/scale_probe_neardup.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.streaming.jobs import neardup_ingest_apply
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark("scale-probe-neardup")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    batch = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .localCheckpoint(eager=True)
    )

    def build_ledger(root: str, n_docs: int, bucketed: bool) -> None:
        wh = Warehouse(spark, root)
        docs = spark.range(n_docs).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.lit("x").alias("text"),
        )
        wh.create_table("c.docs", docs.schema)
        wh.append("c.docs", docs)
        bands = spark.range(n_docs).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
        ).crossJoin(spark.range(4).select(F.col("id").cast("int").alias("band"))).select(
            "doc_id", "band",
            F.md5(F.concat_ws(":", "doc_id", "band")).alias("band_key"),
        )
        if bucketed:
            bands = bands.withColumn(
                "__bucket", F.pmod(F.xxhash64("band_key"), F.lit(64))
            ).repartition("__bucket")
            wh.create_table("c.docs.bands", bands.schema, partition_by=["__bucket"])
        else:
            wh.create_table("c.docs.bands", bands.schema)
            bands = bands.repartition(32)
        wh.append("c.docs.bands", bands)
        sigs = spark.range(n_docs).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            *[
                F.pmod(F.xxhash64(F.col("id") + i), F.lit(1 << 32)).alias(f"g{i}")
                for i in range(16)
            ],
        )
        if bucketed:
            sigs = sigs.withColumn(
                "__bucket", F.pmod(F.xxhash64("doc_id"), F.lit(64))
            ).repartition("__bucket")
            wh.create_table("c.docs.minhash", sigs.schema, partition_by=["__bucket"])
        else:
            wh.create_table("c.docs.minhash", sigs.schema)
            sigs = sigs.repartition(32)
        wh.append("c.docs.minhash", sigs)

    print(f"{'ledger_docs':>12}{'layout':>14}{'median_apply':>14}{'n_new':>7}")
    for n_docs in (5_000, 50_000):
        for bucketed in (False, True):
            template = tempfile.mkdtemp(prefix=f"neardup_probe_{n_docs}_")
            build_ledger(template, n_docs, bucketed)
            runs = []
            stats = None
            for _ in range(3):
                clone = tempfile.mkdtemp(prefix="neardup_clone_")
                shutil.rmtree(clone)
                shutil.copytree(template, clone)
                wh = Warehouse(spark, clone)
                t0 = time.time()
                stats = neardup_ingest_apply(
                    wh, "c.docs", batch,
                    n_sidecar_parts=64 if bucketed else None,
                )
                runs.append(time.time() - t0)
            layout = "bucketed64" if bucketed else "flat"
            print(f"{n_docs:>12}{layout:>14}{sorted(runs)[1]:>13.2f}s"
                  f"{stats['n_new']:>7}")


if __name__ == "__main__":
    main()
