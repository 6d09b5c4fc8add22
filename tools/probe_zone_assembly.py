"""Incremental media-text assembly probe (r14 VERDICT #7): per-ingest
assembly wall against a GROWN zone ledger, zone path (read the
corpus + dupes sidecars the ingest transaction already maintains)
vs batch path (media_dup_clusters re-hashing the full corpus every
call). The claim under test: the zone path pays ZERO Arrow hash
passes per assembly, so its wall stays flat(ish -- bounded by the
sidecar scan) while the batch path grows with the corpus.

Run: python tools/probe_zone_assembly.py
The equality pin lives in tests/test_streaming_media.py
(test_incremental_assembly_matches_batch_mode); the measured table
goes to SCALE.md round 15.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noise(seed: int, n: int) -> bytes:
    out = bytearray()
    x = seed * 2654435761 % (1 << 32)
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(x % 251)
    return bytes(out)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from pg_auto_dw_spark.functions.multimodal import (
        assemble_media_text_pairs,
        media_dup_clusters,
    )
    from pg_auto_dw_spark.streaming.jobs import (
        media_ingest_apply,
        media_zone_cluster_assignments,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("zone-assembly-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="zone_asm_")
    batch_size = 500
    n_batches = 8
    checkpoints = {2, 4, 8}  # measure after these many ingested batches
    out = {"batch_size": batch_size, "points": []}
    try:
        wh = Warehouse(spark, tmp)
        all_rows = []
        next_id = 0
        for b in range(1, n_batches + 1):
            rows = []
            for i in range(batch_size):
                mid = next_id
                next_id += 1
                # every 10th row is a twin of the previous row
                payload = (
                    bytearray(_noise(mid - 1, 600)) if i % 10 == 9
                    else bytearray(_noise(mid, 600))
                )
                if i % 10 == 9:
                    payload[300:308] = b"ZZZZZZZZ"
                rows.append((mid, "image", bytes(payload)))
            batch = spark.createDataFrame(
                rows, "media_id bigint, media_type string, payload binary"
            ).withColumn("meta", F.lit(None).cast("string"))
            media_ingest_apply(
                wh, "z.corpus", batch, dupes_table="z.dupes"
            )
            all_rows += rows
            if b not in checkpoints:
                continue
            # per-ingest use case: assemble captions for the LATEST
            # batch's media against the whole ledger
            links = spark.createDataFrame(
                [(m, 10_000_000 + m) for m, _, _ in rows],
                "media_id bigint, doc_id bigint",
            )
            docs = links.select(
                F.col("doc_id"),
                F.concat(F.lit("caption "), F.col("doc_id")).alias("text"),
            )
            t0 = time.time()
            zc = media_zone_cluster_assignments(wh, "z.corpus", "z.dupes")
            n_inc = assemble_media_text_pairs(docs, links, zc).count()
            zone_wall = round(time.time() - t0, 2)
            t0 = time.time()
            full_media = spark.createDataFrame(
                all_rows, "media_id bigint, media_type string, payload binary"
            ).withColumn("meta", F.lit(None).cast("string"))
            bc = media_dup_clusters(
                full_media, semantic_threshold=None, media_types=("image",)
            )
            n_full = assemble_media_text_pairs(docs, links, bc).count()
            batch_wall = round(time.time() - t0, 2)
            point = {
                "ledger_rows": b * batch_size,
                "zone_wall_s": zone_wall,
                "batch_wall_s": batch_wall,
                "pairs_zone": n_inc,
                "pairs_batch": n_full,
            }
            out["points"].append(point)
            print(json.dumps(point))
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
