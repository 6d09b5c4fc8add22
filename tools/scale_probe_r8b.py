"""10x scale probe for the round-8 session-2 operators.

Same construction as scale_probe_selection.py (documents replicated
10x with shifted ids from $SPARK_GRAFT_SF_DIR); times each operator at
1x and 10x, 3-rep medians:

- gopher_rules            (map-only codegen scan: should track the scan)
- bloom_contamination_flags (bitset build on the FIXED benchmark slice
                           + in-place probe of the growing corpus; the
                           model term is constant, the probe linear)
- equi_width_histogram    (one map-side-combined bounded-output count)
- bpe_train               (distributed word-frequency pass + BOUNDED
                           driver merge loop -- the corpus term is the
                           aggregation, the merge loop is constant)
- bpe_apply               (pure Arrow map with memoized segmentation)

Results feed the SCALE.md scale-up table.

Usage: python tools/scale_probe_r8b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.functions.corpus import bloom_contamination_flags
    from pg_auto_dw_spark.functions.sketch import equi_width_histogram
    from pg_auto_dw_spark.functions.text import gopher_rules
    from pg_auto_dw_spark.functions.tokenizer import bpe_apply, bpe_train
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe-r8b")
    out_dir = "/tmp/scale_probe_r8b_10x"
    doc_path = f"{out_dir}/documents"
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
        print(f"{label:<28}{factor:>4}x{n:>10}{med:>9.2f}s")

    # NOTE (r9 correction): plain .count() on a MAP-ONLY plan lets
    # Catalyst column-prune the operator's expressions entirely -- the
    # original gopher_rules/bloom_flags rows timed a bare parquet row
    # count, not the operator. Aggregating OVER an output column forces
    # the real computation (the action a filter/write consumer pays).
    # bpe_apply (mapInPandas) and the histogram (groupBy) were never
    # prunable; bpe_train collects. Those rows were real.
    def forced(df, col):
        return df.agg(F.sum(F.col(col).cast("long"))).collect()[0][0]

    print(f"{'operator':<28}{'sf':>5}{'rows':>10}{'median':>10}")
    for factor in (1, 10):
        docs = docs_at(factor)
        timed(
            "gopher_rules",
            factor,
            lambda: forced(gopher_rules(docs), "gopher_pass"),
        )
        # benchmark slice FIXED at the 1x members: the eval suite does
        # not grow with the corpus -- that asymmetry is the operator's
        # whole scale story
        bench = docs_at(1).filter(F.col("doc_id") % 97 == 0)
        timed(
            "bloom_flags",
            factor,
            lambda: forced(
                bloom_contamination_flags(docs, bench, m_bits=2**17), "bloom_hit"
            ),
        )
        # same shape at both factors (the events table has no 10x
        # twin): histogram the docs' n_chars by lang so the 1x/10x
        # ratio measures the same workload
        timed(
            "equi_width_histogram",
            factor,
            lambda: equi_width_histogram(
                docs, ["lang"], "n_chars", 0.0, 600.0, 20
            ).count(),
        )
        trained: dict = {}

        def train_once():
            trained["m"] = bpe_train(docs, n_merges=100)
            return len(trained["m"])

        timed("bpe_train_100_merges", factor, train_once)
        # reuse the last timed run's merges -- no fourth training pass
        timed("bpe_apply", factor, lambda: bpe_apply(docs, trained["m"]).count())


if __name__ == "__main__":
    main()
