"""10x scale probe for the round-8 operators.

Derives a 10x documents/embeddings set from $SPARK_GRAFT_SF_DIR
(replicated with shifted ids, the established probe construction) and
times each round-8 operator at 1x and 10x:

- dsir_log_weights          (token-pass model build + broadcast scoring)
- hashed_linear_score       (token-pass + broadcast weight join)
- jsonl quarantine roundtrip (write-derived landing file + split read)
- PQ ADC serving pass       (encode once per factor, then the ADC scan
                             -- the steady-state serving cost)

Replication multiplies token volume 10x while leaving the bucketed
model tables at their fixed bounded sizes, so the selection operators
should scale ~linearly in corpus size with a constant model term.
Results feed the SCALE.md scale-up table.

Usage: python tools/scale_probe_selection.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.pq import pq_encode, pq_topk, pq_train
    from pg_auto_dw_spark.functions.selection import (
        dsir_log_weights,
        hashed_linear_score,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table, read_jsonl_quarantine
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    spark = get_spark("scale-probe-selection")
    out_dir = "/tmp/scale_probe_selection_10x"
    doc_path, emb_path = f"{out_dir}/documents", f"{out_dir}/embeddings"
    if not os.path.isdir(doc_path):
        reps = spark.range(10).select(F.col("id").alias("rep"))
        docs = load_table(spark, sf_dir, "documents")
        (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(doc_path)
        )
        emb = load_table(spark, sf_dir, "embeddings")
        (
            emb.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(emb_path)
        )

    def docs_at(factor: int):
        if factor == 1:
            return load_table(spark, sf_dir, "documents")
        return spark.read.parquet(doc_path)

    def emb_at(factor: int):
        if factor == 1:
            return load_table(spark, sf_dir, "embeddings")
        return spark.read.parquet(emb_path)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def timed(label: str, factor: int, fn) -> None:
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = fn()
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        print(f"{label:<26}{factor:>4}x{n:>10}{med:>9.2f}s")

    print(f"{'operator':<26}{'sf':>5}{'rows':>10}{'median':>10}")
    for factor in (1, 10):
        docs, emb = docs_at(factor), emb_at(factor)
        timed(
            "dsir_log_weights",
            factor,
            lambda: dsir_log_weights(docs, F.col("lang") == "en").count(),
        )
        timed(
            "hashed_linear_score",
            factor,
            lambda: hashed_linear_score(docs).count(),
        )
        # landing-zone roundtrip: derive the file once per factor, then
        # time the split read (the ingest under test)
        land = f"{out_dir}/jsonl_{factor}x"
        mod = F.col("doc_id") % 17
        did = F.col("doc_id").cast("string")
        line = (
            F.when(mod == 3, F.concat(F.lit('{"doc_id": '), did, F.lit(', "text": "x')))
            .when(mod == 5, F.concat(F.lit('{"doc_id": "d'), did, F.lit('", "text": "y"}')))
            .otherwise(F.to_json(F.struct("doc_id", "text")))
        )
        docs.select(line.alias("value")).write.mode("overwrite").text(land)

        def jsonl_run():
            clean, quar = read_jsonl_quarantine(spark, land, schema)
            return clean.count() + quar.count()

        timed("jsonl_quarantine_split", factor, jsonl_run)
        cb = pq_train(emb, m=8, ksub=16, iters=1).localCheckpoint()
        enc = pq_encode(emb, cb, m=8, ksub=16).localCheckpoint()
        enc.count()
        qids = [0, 1, 2, 3, 4]
        timed(
            "pq_adc_topk_serving",
            factor,
            lambda: pq_topk(emb, qids, k=5, codebook=cb, encoded=enc).count(),
        )


if __name__ == "__main__":
    main()
