"""Isolated Bloom PROBE term at 1x / 10x (r8 VERDICT directive 6).

The r8b probe timed bloom_contamination_flags end-to-end, where the
fixed driver-side bitset BUILD dominates at the probed sizes and the
linear in-place probe term is invisible. This probe builds the bloom
ONCE (bloom_build, outside every timed window) and times only the
probe pass -- _with_bloom_hit's zero-shuffle codegen map -- over the
1x and 10x corpora, so the scan-bound claim gets its own number.

Usage: python tools/scale_probe_bloom.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.corpus import bloom_build, bloom_contamination_flags
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-bloom")
    paths = {}
    for factor in (10, 100):
        doc_path = f"/tmp/scale_probe_bloom_{factor}x/documents"
        paths[factor] = doc_path
        if not os.path.isdir(doc_path):
            reps = spark.range(factor).select(F.col("id").alias("rep"))
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
        return spark.read.parquet(paths[factor])

    bench = docs_at(1).filter(F.col("doc_id") % 97 == 0)
    t0 = time.time()
    bloom = bloom_build(bench, m_bits=2**17)  # built ONCE, pinned row
    build_s = time.time() - t0

    def timed(label: str, factor: int, fn) -> float:
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = fn()
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        print(f"{label:<28}{factor:>4}x{n:>10}{med:>9.2f}s")
        return med

    print(f"bloom_build (once, outside timed windows): {build_s:.2f}s")
    print(f"{'operator':<28}{'sf':>5}{'rows':>10}{'median':>10}")
    # .count() on a map-only plan lets Catalyst PRUNE the probe
    # expression entirely (column pruning: nothing consumes bloom_hit),
    # so the timed job would read parquet row counts and never hash a
    # gram. Aggregating OVER bloom_hit forces the real computation --
    # this is the action a real consumer (filter/write) pays.
    def probe_count(docs) -> int:
        return (
            bloom_contamination_flags(docs, bloom=bloom)
            .agg(F.sum(F.col("bloom_hit").cast("long")))
            .collect()[0][0]
        )

    meds = {}
    for factor in (1, 10, 100):
        docs = docs_at(factor)
        meds[factor] = timed(
            "bloom_probe_only",
            factor,
            lambda: probe_count(docs),
        )
    print(f"probe 10x/1x ratio: {meds[10] / meds[1]:.2f}")
    print(f"probe 100x/10x ratio: {meds[100] / meds[10]:.2f}")
    # the marginal per-90x-docs cost once the scheduler floor cancels
    print(f"linear term (100x - 10x over 90x docs): {meds[100] - meds[10]:.2f}s")


if __name__ == "__main__":
    main()
