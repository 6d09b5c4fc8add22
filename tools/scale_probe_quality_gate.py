"""10x scale probe for the streaming quality gate (r11 VERDICT
directive 6 follow-through): jsonl_ingest_apply with the gate OFF vs
ON (Gopher rules + the trained classifier) over JSONL batches built
from the real documents corpus at two SFs. Reports wall per batch and
the gate's marginal cost -- the claim under test is "one batch-sized
pass, no ledger shuffle": overhead should scale with the BATCH, and
the routed split should account for every typed row.

Usage: python tools/scale_probe_quality_gate.py
Paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pg_auto_dw_spark.functions.selection import train_linear_classifier
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.streaming.jobs import jsonl_ingest_apply
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark()
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    print("| sf | rows | mode | clean | rejected | quarantined | s/batch |")
    print("|---|---|---|---|---|---|---|")
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        full = load_table(spark, sf, "documents")
        docs = full.select("doc_id", "text")
        weights, _ = train_linear_classifier(
            full.filter(F.col("lang") == "en"),
            full.filter(F.col("lang") != "en"),
            iters=2,
        )
        weights = weights.localCheckpoint()
        batch = docs.select(
            F.to_json(F.struct("doc_id", "text")).alias("value")
        ).localCheckpoint()
        n = batch.count()
        for mode in ("off", "on"):
            wh = Warehouse(spark, tempfile.mkdtemp(prefix="qg_probe_"))
            kwargs: dict = {}
            if mode == "on":
                kwargs = dict(
                    rejected_table="d.rejected",
                    quality_gopher=True,
                    gopher_kwargs=dict(min_words=10, min_stopwords=1),
                    quality_weights=weights,
                    min_quality_score=-1.0,
                )
            # warm once on a tiny slice, then time the full batch
            jsonl_ingest_apply(
                wh, "w.clean", "w.quar", schema, batch.limit(50), 0, **kwargs
            )
            t0 = time.perf_counter()
            out = jsonl_ingest_apply(
                wh, "d.clean", "d.quar", schema, batch, 1, **kwargs
            )
            dt = time.perf_counter() - t0
            print(
                f"| {sf.rsplit('sf', 1)[1]} | {n} | {mode} | {out['clean']} "
                f"| {out.get('rejected', '-')} | {out['quarantined']} | {dt:.2f} |"
            )


if __name__ == "__main__":
    main()
