"""Scale probe for the packed-shard manifest + resume (r15): wall vs
corpus multiplier for packed_shard_manifest over a
pack_multimodal_sequences placement, plus resume_packed_placement at
a fixed checkpoint. The plan's claims under test: the manifest is ONE
bounded explode (an item touches 1 + span DIV shard_tokens windows,
almost always 1) plus ONE shard-keyed aggregation, and resume is pure
filter arithmetic -- so both walls should scale ~linearly with
placement rows (the scan/shuffle floor), never worse, and the
manifest's own output stays tiny (corpus tokens / shard_tokens rows).

Run: python tools/scale_probe_packed_shards.py [sf_dir]
The measured table goes to SCALE.md round 15.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from pg_auto_dw_spark.functions.corpus import (
        pack_multimodal_sequences,
        packed_shard_manifest,
        resume_packed_placement,
    )
    from pg_auto_dw_spark.functions.multimodal import (
        decode_media,
        synth_media_df,
    )
    from pg_auto_dw_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("packed-shards-probe")
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
        costs = decode_media(media).select("media_id", "n_frames")
        links = media.select(
            "media_id", F.col("media_id").alias("doc_id")
        )
        placed = pack_multimodal_sequences(
            docs, links, costs, seq_tokens=2048, tokens_per_frame=16
        ).localCheckpoint(eager=True)
        n_items = placed.count()

        t0 = time.time()
        man = packed_shard_manifest(
            placed, seq_tokens=2048, seqs_per_shard=64
        )
        n_shards = man.count()
        man_wall = time.time() - t0

        t0 = time.time()
        res = resume_packed_placement(placed, n_shards * 32, 0, seq_tokens=2048)
        n_remaining = res.count()
        res_wall = time.time() - t0

        out["points"].append(
            {
                "mult": mult,
                "placement_rows": n_items,
                "manifest_shards": n_shards,
                "manifest_wall_s": round(man_wall, 2),
                "resume_remaining_rows": n_remaining,
                "resume_wall_s": round(res_wall, 2),
            }
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
