"""Flat vs partition-pruned media sidecars at ledger scale (the media
twin of `scale_probe_neardup_xl`): construct the LEDGER state directly
(media_hash_rows + chunk keys over a 1x and a 100x-derived media
corpus -- the probe measures the per-batch PROBE path, not ingest),
then time `media_ingest_apply` for a fixed 100-row batch against each
ledger size under both layouts. The claim under test: the flat
layout's per-batch floor is one scan of each sidecar and grows with
the ledger; the bucketed layout (n_sidecar_parts=512) partition-prunes
to the batch's touched buckets and stays flat.

Usage: python tools/scale_probe_media_zone_xl.py
Paste the table into SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

TWIN = 1_000_000_000
PARTS = 512


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.multimodal import media_hash_rows, synth_media_df
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.streaming.jobs import _media_chunk_keys, media_ingest_apply
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark("media-zone-xl")
    base = synth_media_df(load_table(spark, sf_dir, "documents"))
    reps = spark.range(100).select(F.col("id").alias("rep"))
    big = base.crossJoin(reps).select(
        (F.col("media_id") + F.col("rep") * 100_000_000).alias("media_id"),
        "media_type",
        F.concat(
            F.col("payload"), F.unhex(F.sha2(F.col("rep").cast("string"), 256))
        ).alias("payload"),
        "meta",
    )

    def build_ledger(wh, media, parts):
        hashes = media_hash_rows(media).localCheckpoint(eager=True)
        chunks = _media_chunk_keys(hashes)
        corpus = media
        if parts:
            hb = F.pmod(F.xxhash64(F.col("media_id")), F.lit(parts))
            cb = F.pmod(
                F.xxhash64(F.col("media_type"), F.col("pos"), F.col("val")),
                F.lit(parts),
            )
            hashes = hashes.withColumn("__bucket", hb).repartition("__bucket")
            chunks = chunks.withColumn("__bucket", cb).repartition("__bucket")
        pb = ["__bucket"] if parts else None
        wh.create_table("m.corpus", corpus.schema)
        wh.append("m.corpus", corpus)
        wh.create_table("m.corpus.phash", hashes.schema, partition_by=pb)
        wh.append("m.corpus.phash", hashes)
        wh.create_table("m.corpus.chunks", chunks.schema, partition_by=pb)
        wh.append("m.corpus.chunks", chunks)
        return hashes.count(), chunks.count()

    root = "/tmp/media_zone_xl"
    print("| ledger media | phash rows | chunk rows | layout | apply s (2 reps) |")
    print("|---|---|---|---|---|")
    for label, media in (("1x", base), ("100x", big)):
        media = media.localCheckpoint(eager=True)
        twins = media.orderBy("media_id").limit(50).select(
            (F.col("media_id") + F.lit(TWIN)).alias("media_id"),
            "media_type",
            F.concat(
                F.expr("substring(payload, 1, 100)"),
                F.unhex(F.repeat(F.lit("2a"), 8)),
                F.expr("substring(payload, 109, 100000000)"),
            ).alias("payload"),
            "meta",
        )
        fresh = spark.range(50).select(
            (F.col("id") + 2 * TWIN).alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.unhex(
                F.sha2(F.concat(F.lit("f"), F.col("id").cast("string")), 512)
            ).alias("payload"),
            F.lit(None).cast("string").alias("meta"),
        )
        batch = twins.unionByName(fresh).localCheckpoint(eager=True)
        n_media = media.count()
        for parts in (None, PARTS):
            whdir = f"{root}/{label}_{parts}"
            shutil.rmtree(whdir, ignore_errors=True)
            wh = Warehouse(spark, whdir)
            n_ph, n_ck = build_ledger(wh, media, parts)
            walls = []
            for rep in range(2):
                # distinct id space per rep so the second apply probes
                # the grown-by-one-batch ledger, not a replay
                b = batch.select(
                    (F.col("media_id") + rep * 10_000_000).alias("media_id"),
                    "media_type", "payload", "meta",
                )
                t0 = time.perf_counter()
                media_ingest_apply(wh, "m.corpus", b, n_sidecar_parts=parts)
                walls.append(time.perf_counter() - t0)
            print(
                f"| {n_media} | {n_ph} | {n_ck} | "
                f"{'bucketed ' + str(parts) if parts else 'flat'} | "
                f"{walls[0]:.2f} / {walls[1]:.2f} |"
            )
            shutil.rmtree(whdir, ignore_errors=True)


if __name__ == "__main__":
    main()
