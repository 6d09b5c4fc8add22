"""10x scale probe for winnow_near_dup_pairs (r11): the composed
candidates -> Jaccard-verify path must stay near-linear in rows. 10x =
nine extra corpus replicas with ids shifted AND a per-replica word tag
appended to every doc (same discipline as the r10 vocabulary-grown
overlap probe: untagged replicas would be exact dups and measure the
degenerate all-dup regime instead of corpus growth).

Usage: python tools/scale_probe_winnow_neardup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from pg_auto_dw_spark.functions.text import winnow_near_dup_pairs
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark("scale-probe-winnow-neardup")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
        .localCheckpoint(eager=True)
    )
    n_base = base.count()

    def replicas(times: int):
        parts = []
        for r in range(times):
            parts.append(
                base.select(
                    (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                    F.concat(
                        F.col("text"), F.lit(f" replica tag {r} variant")
                    ).alias("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint(eager=True)

    print(f"{'rows':>10}{'median':>9}{'pairs':>9}")
    for times in (1, 10):
        docs = replicas(times)
        runs, pairs = [], None
        for _ in range(3):
            t0 = time.time()
            pairs = winnow_near_dup_pairs(docs, jaccard_threshold=0.5).count()
            runs.append(time.time() - t0)
        print(f"{n_base * times:>10}{sorted(runs)[1]:>8.2f}s{pairs:>9}")
        docs.unpersist()


if __name__ == "__main__":
    main()
