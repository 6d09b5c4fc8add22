"""10x scale probe for the round-9 session operators.

Same construction as scale_probe_r8b.py (documents replicated 10x with
shifted ids from $SPARK_GRAFT_SF_DIR); 3-rep medians; every timed
action FORCES evaluation through an aggregate over output columns (the
r9 probe-methodology correction -- plain count() on a map-only plan
column-prunes the operator).

- source_overlap_matrix  (one vocab aggregation; output sources^2)
- corpus_datacard        (one conditional-agg pass; group-sized output)
- tokenizer_stats        (one Arrow map pass + bounded groupBy)
- quality_binned_sample  (zero-shuffle deterministic filter)

Usage: python tools/scale_probe_r9.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.corpus import source_overlap_matrix
    from pg_auto_dw_spark.functions.datacard import corpus_datacard
    from pg_auto_dw_spark.functions.sampling import quality_binned_sample
    from pg_auto_dw_spark.functions.tokenizer import tokenizer_stats
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-r9")
    doc_path = "/tmp/scale_probe_r8b_10x/documents"  # shared replica
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

    def docs_at(factor: int):
        if factor == 1:
            return load_table(spark, sf_dir, "documents")
        return spark.read.parquet(doc_path)

    def timed(label: str, factor: int, fn) -> None:
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = fn()
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        print(f"{label:<26}{factor:>4}x{n:>12}{med:>9.2f}s")

    merges = [("e", "</w>"), ("t", "h"), ("a", "n")]
    print(f"{'operator':<26}{'sf':>5}{'forced_sum':>12}{'median':>10}")
    for factor in (1, 10):
        docs = docs_at(factor)
        timed(
            "source_overlap_matrix",
            factor,
            lambda: source_overlap_matrix(docs)
            .agg(F.sum("shared_grams"))
            .collect()[0][0],
        )
        # force EVERY load-bearing aggregate (summing one column would
        # let Catalyst prune the others -- notably the distinct-sha2
        # dup counter, the expensive one)
        timed(
            "corpus_datacard",
            factor,
            lambda: corpus_datacard(docs)
            .agg(
                F.sum(
                    F.col("n_gopher_pass")
                    + F.col("n_distinct_texts")
                    + F.col("total_words")
                    + F.col("median_chars")
                    + F.col("p95_chars")
                )
            )
            .collect()[0][0],
        )
        timed(
            "tokenizer_stats",
            factor,
            lambda: tokenizer_stats(docs, merges)
            .agg(F.sum("total_bpe_tokens"))
            .collect()[0][0],
        )
        scored = docs.withColumn("score", (F.col("n_chars") % 100).cast("double"))
        timed(
            "quality_binned_sample",
            factor,
            lambda: quality_binned_sample(
                scored, "doc_id", "score", [30.0, 70.0], [0.1, 0.5, 1.0]
            )
            .agg(F.sum("quality_bin"))
            .collect()[0][0],
        )


if __name__ == "__main__":
    main()
