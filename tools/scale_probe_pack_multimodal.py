"""Scale probe for interleaved multimodal packing (r15): wall vs
corpus multiplier for pack_multimodal_sequences. The plan's claims
under test: every window is bounded (<= n_buckets bucket rows,
intra-bucket cumulative sums, items-per-example), the decode cost
pass runs ONCE (the item-frame pin), and nothing is quadratic -- so
wall should scale ~linearly with rows (the scan/shuffle floor), never
worse.

Run: python tools/scale_probe_pack_multimodal.py [sf_dir]
The measured table goes to SCALE.md round 15.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from pg_auto_dw_spark.functions.corpus import pack_multimodal_sequences
    from pg_auto_dw_spark.functions.multimodal import (
        decode_media,
        synth_media_df,
    )
    from pg_auto_dw_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pack-mm-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents")
    out = {"sf_dir": sf_dir, "points": []}
    for mult in (1, 4, 10):
        docs = base
        if mult > 1:
            # disjoint id spaces per copy so every row is a distinct doc
            docs = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__c"),
                "doc_id", "text",
            ).select(
                (F.col("doc_id") + F.col("__c") * 100_000_000).alias("doc_id"),
                "text",
            )
        docs = docs.localCheckpoint(eager=True)
        media = synth_media_df(
            docs.withColumn("source", F.lit("s")).withColumn(
                "lang", F.lit("en")
            )
        )
        links = docs.filter(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("media_id"), "doc_id"
        )
        costs = decode_media(media).select("media_id", "n_frames")
        t0 = time.time()
        n = pack_multimodal_sequences(
            docs, links, costs, seq_tokens=2048, tokens_per_frame=16
        ).count()
        wall = round(time.time() - t0, 2)
        point = {"mult": mult, "rows": docs.count(), "items": n, "wall_s": wall}
        out["points"].append(point)
        print(json.dumps(point))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
