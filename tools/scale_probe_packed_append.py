"""Scale probe for incremental packed-corpus append (r15): the claim
under test is the headline one -- appending a FIXED batch of new docs
costs O(new tokens) in data writes, never O(corpus). The corpus grows
1x/4x/10x; the appended batch stays constant; append wall should stay
~flat up to the two honest metadata terms the operator documents (the
manifest recompute scans the ITEM-grain placement map, and the
partition-CoW hardlink pass is O(existing file count)) -- both
metadata-scale, neither token data.

Run: python tools/scale_probe_packed_append.py [sf_dir]
The measured table goes to SCALE.md round 15.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from pg_auto_dw_spark.functions.corpus import (
        append_packed_corpus,
        write_packed_corpus,
    )
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("packed-append-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents")
    batch = (
        base.limit(2000)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    out = {"sf_dir": sf_dir, "batch_docs": batch.count(), "points": []}
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
        tmp = tempfile.mkdtemp(prefix="probe_append_")
        try:
            wh = Warehouse(spark, tmp)
            t0 = time.time()
            stats0 = write_packed_corpus(
                wh, docs, "c", seq_tokens=2048, seqs_per_shard=16
            )
            write_wall = time.time() - t0
            t0 = time.time()
            stats1 = append_packed_corpus(wh, batch, "c")
            append_wall = time.time() - t0
            out["points"].append(
                {
                    "mult": mult,
                    "corpus_tokens": stats0["tokens"],
                    "corpus_shards": stats0["shards"],
                    "write_wall_s": round(write_wall, 2),
                    "appended_tokens": stats1["tokens"] - stats0["tokens"],
                    "append_wall_s": round(append_wall, 2),
                }
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
