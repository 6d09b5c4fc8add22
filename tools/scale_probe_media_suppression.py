"""Blank-media suppression, measured (r12 VERDICT directive 4): the
r12 video 10x probe found the degenerate low-entropy regime -- word-
soup payloads slice to near-constant frames, hashes concentrate into
few pigeonhole buckets, the hot-bucket cap saturates CORPUS-WIDE and
planted-twin recall collapses (28/33 at 1x -> 155/333 at 10x). This
probe quantifies what `min_spread` suppression buys back: for each SF
and each min_spread, planted-twin recall, total pair count, the
bucket monitor's over-cap row count and suppressed-pair total
(`dedup.hamming_bucket_stats` run beside the pair job on the SAME
frame-hash frame -- the composed monitoring path), and wall.

The trade it measures honestly: suppression removes the saturating
flat-frame population (recall recovers, spurious pairs vanish), but a
twin whose SHARED frames are themselves flat loses its evidence with
them -- the right min_spread is corpus-dependent, and the monitor's
over-cap count is the signal for where to set it.

Usage: python tools/scale_probe_media_suppression.py
Paste the table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TWIN = 1_000_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.dedup import hamming_bucket_stats
    from pg_auto_dw_spark.functions.multimodal import (
        _FRAME_SHIFT,
        synth_media_df,
        video_frame_hashes,
        video_near_dup_pairs,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark()
    print("| sf | videos | planted | min_spread | frames kept | overcap buckets | pairs suppressed | pairs | planted recall | s |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        base = synth_media_df(load_table(spark, sf, "documents")).filter(
            F.col("media_type") == "video"
        )
        # same planting as scale_probe_phash: scene-edit twin per 5th
        # video (middle replaced by sha2 bytes -- structurally new
        # content, not a tone shift dHash is invariant to)
        twins = base.filter(F.col("media_id") % 5 == 0).select(
            (F.col("media_id") + F.lit(TWIN)).alias("media_id"),
            "media_type",
            F.concat(
                F.expr("substring(payload, 1, 64)"),
                F.unhex(F.sha2(F.col("payload"), 256)),
                F.expr("substring(payload, 97, 10000000)"),
            ).alias("payload"),
            "meta",
        )
        n_planted = twins.count()
        media = base.unionByName(twins).localCheckpoint(eager=True)
        n = media.count()
        for min_spread in (0, 2, 4, 8):
            t0 = time.perf_counter()
            fh = video_frame_hashes(media, min_spread=min_spread)
            keyed = fh.select(
                (F.col("media_id") * _FRAME_SHIFT + F.col("frame_no")).alias("fk"),
                "fhash",
            ).localCheckpoint(eager=True)
            kept = keyed.count()
            mon = hamming_bucket_stats(keyed, "fhash", "fk").agg(
                F.count(F.lit(1)).alias("buckets"),
                F.coalesce(F.sum("pairs_suppressed"), F.lit(0)).alias("supp"),
            ).collect()[0]
            pairs = video_near_dup_pairs(
                media, min_shared_frames=2, min_spread=min_spread
            ).localCheckpoint(eager=True)
            n_pairs = pairs.count()
            hit = pairs.filter(F.col("id_b") - F.col("id_a") == TWIN).count()
            t1 = time.perf_counter()
            print(
                f"| {sf.rsplit('sf', 1)[1]} | {n} | {n_planted} | {min_spread} "
                f"| {kept} | {mon['buckets']} | {mon['supp']} "
                f"| {n_pairs} | {hit}/{n_planted} | {t1 - t0:.2f} |"
            )


if __name__ == "__main__":
    main()
