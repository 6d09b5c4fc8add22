"""100x scale probe for the media hash kernel + pigeonhole pair join.

Derives a 100x media table from sf0.1 documents (payloads perturbed
per replica by an appended sha2 tail -- the stub grid's segment
boundaries all shift with length, so every replica hashes fresh; plain
replication would make every replica an exact dup and measure only
hot-bucket cliques). Measures:

- media_hash_rows      (the zone's one-pass Arrow kernel; the claim is
                        linear rows/s -- it is the 100 TB IO floor)
- image pair join      (hamming_chunk_pairs over the ~200k image
                        hashes; the claim is bucket-bounded wall, not
                        pair-space quadratic)

Prints one table; add the numbers to SCALE.md.
Usage: python tools/scale_probe_media_100x.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

FACTOR = 100


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.dedup import hamming_chunk_pairs
    from pg_auto_dw_spark.functions.multimodal import (
        media_hash_rows,
        synth_media_df,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-media-100x")
    base = synth_media_df(load_table(spark, sf_dir, "documents"))
    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))
    big = (
        base.crossJoin(reps)
        .select(
            (F.col("media_id") + F.col("rep") * 100_000_000).alias("media_id"),
            "media_type",
            F.concat(
                F.col("payload"),
                F.unhex(F.sha2(F.col("rep").cast("string"), 256)),
            ).alias("payload"),
            "meta",
        )
        .repartition(64)
    )
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    big_path = os.path.join(shm, "media_100x.parquet")
    if not os.path.isdir(big_path):
        big.write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)

    print("| stage | scale | rows in | rows out | s | rows/s |")
    print("|---|---|---|---|---|---|")
    for label, media in (("1x", base), (f"{FACTOR}x", big)):
        n_in = media.count()
        t0 = time.perf_counter()
        hashes = media_hash_rows(media).localCheckpoint(eager=True)
        n_out = hashes.count()
        t1 = time.perf_counter()
        print(
            f"| media_hash_rows | {label} | {n_in} | {n_out} "
            f"| {t1 - t0:.2f} | {int(n_out / (t1 - t0))} |"
        )
        img = hashes.filter(F.col("media_type") == "image").select(
            "media_id", "mhash"
        )
        n_img = img.count()
        t2 = time.perf_counter()
        pairs = hamming_chunk_pairs(
            img, "mhash", "media_id",
            max_hamming=6, bits=64, n_chunks=8, max_bucket_size=256,
        )
        n_pairs = pairs.count()
        t3 = time.perf_counter()
        print(
            f"| image pair join | {label} | {n_img} | {n_pairs} "
            f"| {t3 - t2:.2f} | {int(n_img / (t3 - t2))} |"
        )


if __name__ == "__main__":
    main()
