"""Scale probe for the embedding-family operators (round 6).

Derives 10x and 100x corpora from sf0.1's embeddings (2k rows) by
replication with shifted ids and a deterministic per-replica
perturbation of one coordinate (so replicas neither collide as exact
duplicates nor concentrate into one LSH bucket), then measures:

- embedding_near_dup_pairs  (bucketed gram-matrix kernel + star fallback)
- ivf index build           (k-means codebook + full-corpus assignment)
- ivf_topk probe            (against the built index: the steady-state cost)
- brute_force_topk          (10 queries, single corpus scan)

Prints one table; add the numbers to SCALE.md. The interesting check:
near-dup and probe should scale ~linearly in corpus size (bucket/cell
counts grow with n, per-bucket work bounded by the caps), index build
~linearly (one broadcast-score pass), brute force ~linearly (scan-
bound for a fixed query set).

Usage: python tools/scale_probe_ann.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def derived(spark, emb, factor: int):
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    pert = F.transform(
        "embedding",
        lambda x, i: F.when(
            i == (F.col("rep") % 64).cast("int"),
            x + (F.col("rep") % 97).cast("float") * F.lit(0.013),
        ).otherwise(x),
    )
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            pert.alias("embedding"),
            "label",
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        ivf_assign,
        ivf_kmeans_codebook,
        ivf_topk,
    )
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-ann")
    base = load_table(spark, sf_dir, "embeddings")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"{'op':<28}{'factor':>8}{'rows':>10}{'sec':>9}{'out_rows':>10}")
    for factor in (1, 10, 100):
        emb = base if factor == 1 else derived(spark, base, factor)
        n = emb.count()
        # stride scales so the codebook stays O(sqrt n)-ish
        stride = 50 if factor == 1 else (160 if factor == 10 else 500)

        t0 = time.time()
        nd = embedding_near_dup_pairs(
            emb, threshold=0.25, n_planes=4, hyperplanes=False
        ).count()
        print(f"{'near_dup_pairs':<28}{factor:>8}{n:>10}{time.time()-t0:>9.2f}{nd:>10}")

        t0 = time.time()
        cb = ivf_kmeans_codebook(emb, stride=stride, iters=1).localCheckpoint(eager=True)
        idx = ivf_assign(emb, codebook=cb).localCheckpoint(eager=True)
        idx.count()
        print(f"{'ivf_index_build':<28}{factor:>8}{n:>10}{time.time()-t0:>9.2f}{'-':>10}")

        t0 = time.time()
        k = ivf_topk(emb, k=5, stride=stride, assigned=idx).count()
        print(f"{'ivf_probe_topk':<28}{factor:>8}{n:>10}{time.time()-t0:>9.2f}{k:>10}")

        t0 = time.time()
        bf = brute_force_topk(emb, query_ids=list(range(10)), k=5).count()
        print(f"{'brute_force_topk(10q)':<28}{factor:>8}{n:>10}{time.time()-t0:>9.2f}{bf:>10}")


if __name__ == "__main__":
    main()
