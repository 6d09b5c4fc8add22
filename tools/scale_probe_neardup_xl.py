"""Corpus-scale validation of the bucketed-sidecar crossover (r10
VERDICT #5): the r10 measurement stopped at 50k ledger docs (where the
flat scan still wins) and CLAIMED the crossover needs a corpus-scale
ledger -- this grows the ledger to millions of signed docs and
measures both layouts at a regime where partition pruning actually
engages.

Two deliberate changes vs tools/scale_probe_neardup.py:
- parts=512 and a 100-doc batch: the bands probe touches ~54% of
  buckets and the signature probe ~18%, so the <=0.8 prune gate is
  actually exercised (at the r10 probe's 64 parts / 200-doc batch,
  800 band keys covered every bucket and the 'bucketed' number was
  pure overhead -- no pruning ever happened).
- 40 of the batch docs are PLANTED in the ledger under different ids
  (their real signatures, computed by the same kernels), so the
  cross-batch candidate path and the signature-ledger probe run
  against real hits instead of an empty candidate set.

Usage: python tools/scale_probe_neardup_xl.py [--quick]
(--quick: 200k ledger only, for CI-style smoke; full run: 200k / 1M /
3M, both layouts.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PARTS = 512
BATCH_DOCS = 100
PLANTED = 40


def main() -> None:
    from pg_auto_dw_spark.functions.dedup import (
        lsh_band_keys_wide,
        minhash_signatures_wide,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.streaming.jobs import neardup_ingest_apply
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark("scale-probe-neardup-xl")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    batch = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
        .limit(BATCH_DOCS)
        .localCheckpoint(eager=True)
    )
    # real signatures for the planted ledger twins (ids shifted into
    # the synthetic ledger's id space so they are CROSS-batch dups)
    planted_src = batch.limit(PLANTED)
    planted_sigs = minhash_signatures_wide(
        planted_src, "text", "doc_id", 16, 5
    ).withColumn("doc_id", F.col("doc_id") + F.lit(500_000_000))
    planted_bands = lsh_band_keys_wide(planted_sigs, "doc_id", 4)
    planted_sigs = planted_sigs.localCheckpoint(eager=True)
    planted_bands = planted_bands.localCheckpoint(eager=True)

    def build_ledger(root: str, n_docs: int, bucketed: bool) -> None:
        wh = Warehouse(spark, root)
        docs = spark.range(n_docs).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.lit("x").alias("text"),
        )
        wh.create_table("c.docs", docs.schema)
        wh.append("c.docs", docs)
        bands = (
            spark.range(n_docs)
            .select((F.col("id") + 1_000_000).alias("doc_id"))
            .crossJoin(spark.range(4).select(F.col("id").cast("int").alias("band")))
            .select(
                "doc_id", "band",
                F.md5(F.concat_ws(":", "doc_id", "band")).alias("band_key"),
            )
            .unionByName(planted_bands)
        )
        sigs = spark.range(n_docs).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            *[
                F.pmod(F.xxhash64(F.col("id") + i), F.lit(1 << 32)).alias(f"g{i}")
                for i in range(16)
            ],
        ).unionByName(planted_sigs)
        if bucketed:
            bands = bands.withColumn(
                "__bucket", F.pmod(F.xxhash64("band_key"), F.lit(PARTS))
            ).repartition("__bucket")
            wh.create_table("c.docs.bands", bands.schema, partition_by=["__bucket"])
            sigs = sigs.withColumn(
                "__bucket", F.pmod(F.xxhash64("doc_id"), F.lit(PARTS))
            ).repartition("__bucket")
            wh.create_table("c.docs.minhash", sigs.schema, partition_by=["__bucket"])
        else:
            wh.create_table("c.docs.bands", bands.schema)
            bands = bands.repartition(32)
            wh.create_table("c.docs.minhash", sigs.schema)
            sigs = sigs.repartition(32)
        wh.append("c.docs.bands", bands)
        wh.append("c.docs.minhash", sigs)

    quick = "--quick" in sys.argv
    sizes = (200_000,) if quick else (200_000, 1_000_000, 3_000_000)
    print(
        f"{'ledger_docs':>12}{'layout':>14}{'reps':>5}{'median_apply':>14}"
        f"{'n_cross':>8}{'n_new':>7}"
    )
    for n_docs in sizes:
        for bucketed in (False, True):
            reps = 3 if n_docs <= 200_000 else 2
            template = tempfile.mkdtemp(prefix=f"ndxl_{n_docs}_")
            build_ledger(template, n_docs, bucketed)
            runs, stats = [], None
            for _ in range(reps):
                clone = tempfile.mkdtemp(prefix="ndxl_clone_")
                shutil.rmtree(clone)
                shutil.copytree(template, clone)
                wh = Warehouse(spark, clone)
                t0 = time.time()
                stats = neardup_ingest_apply(
                    wh, "c.docs", batch,
                    n_sidecar_parts=PARTS if bucketed else None,
                )
                runs.append(time.time() - t0)
                shutil.rmtree(clone, ignore_errors=True)
            shutil.rmtree(template, ignore_errors=True)
            layout = f"bucketed{PARTS}" if bucketed else "flat"
            med = sorted(runs)[len(runs) // 2] if reps % 2 else sum(runs) / reps
            print(
                f"{n_docs:>12}{layout:>14}{reps:>5}{med:>13.2f}s"
                f"{stats['n_cross_dups']:>8}{stats['n_new']:>7}"
            )


if __name__ == "__main__":
    main()
