"""10x scale probe for the media landing zone (r12 VERDICT directive
5): measure `media_ingest_apply` per-batch wall against (a) a 10x
LEDGER (sf0.01 vs sf0.1 corpora fully ingested) and (b) a 10x BATCH,
with planted re-encodes to report the cross-batch catch rate. The
claims under test: per-batch cost is batch-sized plus one scan of each
sidecar (zero-ledger-shuffle probe direction), so wall grows with the
BATCH, not the corpus; and re-encoded near-copies of already-ingested
media are caught at ledger scale.

Usage: python tools/scale_probe_media_zone.py
Paste the table into SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TWIN = 1_000_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.multimodal import synth_media_df
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.streaming.jobs import media_ingest_apply
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark()
    root = "/tmp/media_zone_probe"
    # "escaped" is the recall complement that matters: planted
    # re-encodes admitted to the corpus. A planted twin can be caught
    # EITHER by the cross-batch probe (dupes row) or by the
    # within-batch collapse when several twins of mutually-near corpus
    # rows cluster and ride one canonical's verdict -- both are
    # catches; only admission is a miss.
    print("| ledger (sf) | ledger media | batch | planted re-encodes | escaped | new admitted | apply s |")
    print("|---|---|---|---|---|---|---|")
    for sf, batch_sizes in (
        ("/root/testdata/sf0.01", (100,)),
        ("/root/testdata/sf0.1", (100, 1000)),
    ):
        media = synth_media_df(load_table(spark, sf, "documents")).localCheckpoint(
            eager=True
        )
        for batch_n in batch_sizes:
            whdir = f"{root}/{sf.rsplit('sf', 1)[1]}_{batch_n}"
            shutil.rmtree(whdir, ignore_errors=True)
            wh = Warehouse(spark, whdir)
            media_ingest_apply(wh, "m.corpus", media)
            n_ledger = wh.read("m.corpus").count()
            # half the batch: structural re-encodes of corpus rows
            # (bytes 101..108 re-toned -- a LOCAL edit; whole-payload
            # tone shifts are dHash-invariant and would be trivial);
            # other half: fresh noise payloads
            twins = media.orderBy("media_id").limit(batch_n // 2).select(
                (F.col("media_id") + TWIN).alias("media_id"),
                "media_type",
                F.concat(
                    F.expr("substring(payload, 1, 100)"),
                    F.unhex(F.repeat(F.lit("2a"), 8)),
                    F.expr("substring(payload, 109, 100000000)"),
                ).alias("payload"),
                "meta",
            )
            fresh = (
                spark.range(batch_n - batch_n // 2)
                .select(
                    (F.col("id") + 2 * TWIN).alias("media_id"),
                    F.element_at(
                        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.col("id") % 3 + 1).cast("int"),
                    ).alias("media_type"),
                    F.unhex(
                        F.sha2(F.concat(F.lit("fresh"), F.col("id").cast("string")), 512)
                    ).alias("payload"),
                    F.lit(None).cast("string").alias("meta"),
                )
            )
            batch = twins.unionByName(fresh).localCheckpoint(eager=True)
            n_planted = twins.count()
            t0 = time.perf_counter()
            stats = media_ingest_apply(wh, "m.corpus", batch, dupes_table="m.dupes")
            wall = time.perf_counter() - t0
            escaped = (
                wh.read("m.corpus")
                .filter(
                    (F.col("media_id") >= TWIN) & (F.col("media_id") < 2 * TWIN)
                )
                .count()
            )
            print(
                f"| {sf.rsplit('sf', 1)[1]} | {n_ledger} | {batch_n} "
                f"| {n_planted} | {escaped} | {stats['n_new']} "
                f"| {wall:.2f} |"
            )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
