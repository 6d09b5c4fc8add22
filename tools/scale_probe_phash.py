"""10x scale probe for the perceptual-hash image near-dup family
(r11 VERDICT directive 5): run perceptual_hashes +
image_near_dup_pairs + connected_components over the synthetic media
table at two SFs (10x the image rows) and report wall, pair counts,
and cluster counts -- the growth curve that shows the pigeonhole join
stays bucket-bounded instead of quadratic.

The media table is synth_media_df over the REAL documents corpus
(payload = text bytes), so the corpus's planted near-dup clusters
become near-dup images under the locality-preserving stub decode.

Usage: python tools/scale_probe_phash.py
Paste the table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.dedup import connected_components
    from pg_auto_dw_spark.functions.multimodal import (
        image_near_dup_pairs,
        synth_media_df,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark()
    print("| sf | images | planted | pairs | clusters>1 | hash+pair s | +cc s |")
    print("|---|---|---|---|---|---|---|")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        base = synth_media_df(load_table(spark, sf, "documents")).filter(
            F.col("media_type") == "image"
        )
        # plant an edited twin for every 5th image: first 16 payload
        # bytes re-toned (one grid locality), twin id = id + 10^9 --
        # the near-dup recall target, scaling 1:1 with the corpus
        twins = base.filter(F.col("media_id") % 5 == 0).select(
            (F.col("media_id") + F.lit(1_000_000_000)).alias("media_id"),
            "media_type",
            F.concat(
                F.unhex(F.repeat(F.lit("2a"), 16)),
                F.expr("substring(payload, 17, 10000000)"),
            ).alias("payload"),
            "meta",
        )
        n_planted = twins.count()
        media = base.unionByName(twins)
        n = media.count()
        t0 = time.perf_counter()
        pairs = image_near_dup_pairs(media, max_hamming=6)
        pairs = pairs.localCheckpoint(eager=True)
        n_pairs = pairs.count()
        t1 = time.perf_counter()
        comp = connected_components(
            pairs.select("id_a", "id_b"),
            nodes=media.select("media_id"),
            id_col="media_id",
        )
        n_clusters = (
            comp.groupBy("cluster_id").count().filter(F.col("count") > 1).count()
        )
        t2 = time.perf_counter()
        print(
            f"| {sf.rsplit('sf', 1)[1]} | {n} | {n_planted} | {n_pairs} "
            f"| {n_clusters} | {t1 - t0:.2f} | {t2 - t1:.2f} |"
        )

    from pg_auto_dw_spark.functions.multimodal import video_near_dup_pairs

    print()
    print("| sf | videos | planted | pairs@>=2 | pairs@>=8 | s |")
    print("|---|---|---|---|---|")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        base = synth_media_df(load_table(spark, sf, "documents")).filter(
            F.col("media_type") == "video"
        )
        # plant a scene-edited twin per 5th video: the middle of the
        # payload replaced with its sha2 (structurally unrelated bytes
        # -- tone shifts would be INVARIANT under dHash), the rest of
        # the frames byte-identical
        twins = base.filter(F.col("media_id") % 5 == 0).select(
            (F.col("media_id") + F.lit(1_000_000_000)).alias("media_id"),
            "media_type",
            F.concat(
                F.expr("substring(payload, 1, 64)"),
                F.unhex(F.sha2(F.col("payload"), 256)),
                F.expr("substring(payload, 97, 10000000)"),
            ).alias("payload"),
            "meta",
        )
        n_planted = twins.count()
        media = base.unionByName(twins)
        n = media.count()
        t0 = time.perf_counter()
        pairs = video_near_dup_pairs(
            media, max_hamming=6, min_shared_frames=2
        ).localCheckpoint(eager=True)
        t1 = time.perf_counter()
        n_pairs = pairs.count()
        planted_hit = pairs.filter(
            F.col("id_b") - F.col("id_a") == 1_000_000_000
        ).count()
        # stricter evidence floor: short word-soup payloads yield
        # low-entropy near-constant frames that legitimately
        # cross-match (the blank-frame regime); a real corpus tunes
        # min_shared_frames to its frame entropy
        n_strict = pairs.filter(F.col("shared_frames") >= 8).count()
        strict_hit = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1_000_000_000)
            & (F.col("shared_frames") >= 8)
        ).count()
        print(
            f"| {sf.rsplit('sf', 1)[1]} | {n} | {n_planted} "
            f"| {n_pairs} ({planted_hit} planted) "
            f"| {n_strict} @>=8 ({strict_hit} planted) | {t1 - t0:.2f} |"
        )


if __name__ == "__main__":
    main()
