"""Cross-modal retrieval recall curve (r14 VERDICT #4): measured
recall@k / hit-rate vs n_probes for cross_modal_retrieval_eval at
sf0.01, over the same assembled-pairs construction the
media_text_pairs_docs oracle runs (synthetic image media + planted
twins + derived caption links). The exact anchor (n_probes >= cells)
and each probed point come from the SAME code path, so the curve is
the function re-run across the knob -- the semsearch recall-curve
protocol applied cross-modal.

Run: python tools/probe_cross_modal_recall.py [sf_dir]
The floor pins live in tests/test_cross_modal_retrieval.py; the
measured table goes to SCALE.md round 15.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from pg_auto_dw_spark.functions.multimodal import (
        assemble_media_text_pairs,
        cross_modal_retrieval_eval,
        media_dup_clusters,
        synth_media_df,
    )
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("xmodal-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_df(docs).filter(F.col("media_type") == "image")
    clusters = media_dup_clusters(
        media, semantic_threshold=None, media_types=("image",)
    )
    # ALIGNED links (media d captioned by doc d: caption text == payload
    # bytes, cosine 1 under the shared encoder) so the exact anchor is
    # recall 1.0 and the curve isolates IVF probe loss; the UNALIGNED
    # variant (doc d+1 captions) instead measures the ENCODER ceiling
    # (~0.07 at sf0.01 -- the min_alignment calibration signal, r15).
    links = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"),
        F.col("doc_id").alias("doc_id"),
    )
    pairs = assemble_media_text_pairs(
        docs, links, clusters, with_pair_group=False
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    # PERTURBED variant: captions carry a same-length mid-8-char edit
    # (the twin-densification construction), so the two towers' vectors
    # are near-but-not-identical -- queries CAN land in a different
    # cell than their counterpart, which is the loss n_probes buys back
    perturbed = pairs.withColumn(
        "text",
        F.concat(
            F.expr("substring(text, 1, cast(length(text) / 2 as int))"),
            F.lit("ZZZZZZZZ"),
            F.expr("substring(text, cast(length(text) / 2 as int) + 9)"),
        ),
    ).localCheckpoint(eager=True)
    tmp = tempfile.mkdtemp(prefix="xmodal_wh_")
    try:
        wh = Warehouse(spark, tmp)
        out = {"sf_dir": sf_dir, "n_pairs": n_pairs, "k": 10, "variants": {}}
        for variant, frame in (("aligned", pairs), ("perturbed", perturbed)):
            points = []
            for n_probes in (1, 2, 4, 8, 9999):
                t0 = time.time()
                rows = cross_modal_retrieval_eval(
                    wh, frame, media, k=10, dims=64, stride=50,
                    n_probes=n_probes,
                    index_prefix=f"xm_{variant}_{n_probes}",
                ).collect()
                wall = round(time.time() - t0, 2)
                point = {"n_probes": n_probes, "wall_s": wall}
                for r in rows:
                    point[r["direction"]] = {
                        "n_queries": r["n_queries"],
                        "macro_recall": r["macro_recall"],
                        "hit_rate": r["hit_rate"],
                    }
                points.append(point)
                print(json.dumps({"variant": variant, **point}))
            out["variants"][variant] = points
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
