"""Vocabulary-growth scale probe for source_overlap_matrix (r9 VERDICT
directive 5).

The r9 10x probe replicated IDENTICAL texts, so the post-distinct
vocabulary term -- the one that actually scales -- stayed constant by
construction. Here each 10x replica tags EVERY word with its replica
id (word -> word + "x<rep>"), so every replica contributes a disjoint
gram vocabulary: rows grow 10x AND the distinct-gram set grows ~10x.
The comparison row keeps the identical-text replica (same rows, same
vocab as r9's probe), isolating the vocabulary term:

    1x   original                 (V grams,   N rows)
    10xR identical-text replicas  (V grams,  10N rows)  [r9's shape]
    10xV tagged-word replicas    (10V grams, 10N rows)  [this probe]

Forced evaluation via SUM(shared_grams) over the full output (the r9
count()-prune correction). 3-rep medians.

Usage: python tools/scale_probe_overlap_vocab.py
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
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-overlap-vocab")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    reps = spark.range(10).select(F.col("id").alias("rep"))

    def replicate(tag_words: bool):
        r = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text",
            "source",
            "rep",
        )
        if tag_words:
            r = r.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(
                            w, F.lit("x"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                ),
            )
        return r.drop("rep")

    paths = {}
    for label, df in [
        ("10xR", replicate(tag_words=False)),
        ("10xV", replicate(tag_words=True)),
    ]:
        p = f"/tmp/scale_probe_overlap_{label}/documents"
        if not os.path.isdir(p):
            df.repartition(32).write.mode("overwrite").parquet(p)
        paths[label] = p

    def timed(label: str, frame) -> None:
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = (
                source_overlap_matrix(frame)
                .agg(F.sum("shared_grams"))
                .collect()[0][0]
            )
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        vocab = (
            frame.selectExpr(
                "explode(filter(split(trim(regexp_replace(lower(text),"
                " '[^a-z0-9]+', ' ')), '\\\\s+'), t -> t != '')) AS w"
            )
            .agg(F.countDistinct("w"))
            .collect()[0][0]
        )
        print(f"{label:<6}{vocab:>12}{n:>16}{med:>9.2f}s")

    print(f"{'case':<6}{'dist_words':>12}{'forced_sum':>16}{'median':>10}")
    timed("1x", docs)
    timed("10xR", spark.read.parquet(paths["10xR"]))
    timed("10xV", spark.read.parquet(paths["10xV"]))


if __name__ == "__main__":
    main()
