"""Query-count scale probe for retrieval.ivf_search_frame: the
distributed frame search should amortize its fixed job cost across the
wave -- wall grows far slower than query count (per-query cost is
probes/cells of the corpus plus a share of the fixed shuffle).

Index: the sf embeddings table. Query waves: the corpus vectors
replicated with shifted ids at 1x/10x/50x wave sizes. 3-rep medians,
forced via an aggregate over the output (count() would prune nothing
here -- the cogroup materializes -- but keep the forced-eval
discipline anyway).

Usage: python tools/scale_probe_frame_search.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from pg_auto_dw_spark.functions.retrieval import ivf_search_frame
    from pg_auto_dw_spark.functions.similarity import build_ivf_index
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark("frame-search-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="frame_probe_"))
    build_ivf_index(wh, vecs, "ix", stride=40, iters=1, seed_hash=True)
    n_corpus = vecs.count()

    print(f"{'wave':>8}{'queries':>9}{'median':>9}{'us/query':>10}")
    for factor in (1, 10, 50):
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        wave = (
            vecs.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * 1_000_000).alias("query_id"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )
        nq = n_corpus * factor
        runs = []
        for _ in range(3):
            t0 = time.time()
            ivf_search_frame(wh, "ix", wave, k=5, n_probes=2).agg(
                F.sum("cosine"), F.count(F.lit(1))
            ).collect()
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        print(f"{factor:>7}x{nq:>9}{med:>8.2f}s{med / nq * 1e6:>9.1f}")


if __name__ == "__main__":
    main()
