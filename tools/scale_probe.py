"""10x scale probe for the round-5 operators.

Derives a 10x dataset from $SPARK_GRAFT_SF_DIR (events/documents
replicated with shifted ids -- same time span, so event DENSITY grows
10x, the hard direction for interval joins) and times each round-5
operator at 1x and 10x. Results feed the SCALE.md scale-up table.

Usage: python tools/scale_probe.py [ops...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table

    spark = get_spark("scale-probe")
    out_dir = "/tmp/scale_probe_10x"
    ev_path, doc_path = f"{out_dir}/events", f"{out_dir}/documents"
    if not os.path.isdir(ev_path):
        ev = load_table(spark, sf_dir, "events")
        reps = spark.range(10).select(F.col("id").alias("rep"))
        (
            ev.crossJoin(reps)
            .select(
                (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("rep") * 10_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(ev_path)
        )
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

    def events(scale):
        return (
            load_table(spark, sf_dir, "events")
            if scale == 1
            else spark.read.parquet(ev_path)
        )

    def docs(scale):
        return (
            load_table(spark, sf_dir, "documents")
            if scale == 1
            else spark.read.parquet(doc_path)
        )

    from pg_auto_dw_spark.functions.match import keyword_tfidf_scores
    from pg_auto_dw_spark.functions.rangejoin import range_join_agg
    from pg_auto_dw_spark.functions.sampling import stratified_sample
    from pg_auto_dw_spark.functions.skew import salted_agg
    from pg_auto_dw_spark.functions.text import chunk_documents

    def op_range(scale):
        ev = events(scale)
        p = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("ts").alias("cts"), F.col("value").alias("cv")
        )
        return range_join_agg(
            p, c, "ts", "cts", -600, 0, aggs=[F.count("cts").alias("n")]
        )

    def op_sample(scale):
        return stratified_sample(
            docs(scale).select("doc_id", "lang"),
            "doc_id",
            {"en": 0.25, "zh": 0.8},
            "lang",
            0.5,
        )

    def op_salted(scale):
        return salted_agg(
            events(scale).select("event_type", "value"),
            ["event_type"],
            [("count", "value", "n"), ("sum", "value", "s")],
        )

    def op_chunk(scale):
        return chunk_documents(docs(scale), 40, 20)

    def op_tfidf(scale):
        return keyword_tfidf_scores(docs(scale), ["spark", "merge", "window"])

    from pg_auto_dw_spark.functions.corpus import leakage_safe_split
    from pg_auto_dw_spark.functions.text import redact_pii

    def op_pii(scale):
        return redact_pii(docs(scale))

    def op_split(scale):
        return leakage_safe_split(docs(scale), val_fraction=0.1)

    ops = {
        "range_join_agg": op_range,
        "stratified_sample": op_sample,
        "salted_agg": op_salted,
        "chunk_documents": op_chunk,
        "keyword_tfidf": op_tfidf,
        "redact_pii": op_pii,
        "leakage_safe_split": op_split,
    }
    names = sys.argv[1:] or list(ops)
    print(f"{'op':20s} {'1x(s)':>8s} {'10x(s)':>8s} {'ratio':>6s} {'rows1x':>10s} {'rows10x':>10s}")
    for name in names:
        fn = ops[name]
        res = {}
        for scale in (1, 10):
            fn(scale).count()  # warm: codegen + footer cache
            t0 = time.time()
            n = fn(scale).count()
            res[scale] = (time.time() - t0, n)
        r = res[10][0] / max(res[1][0], 1e-9)
        print(
            f"{name:20s} {res[1][0]:8.2f} {res[10][0]:8.2f} {r:6.1f} "
            f"{res[1][1]:10d} {res[10][1]:10d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
