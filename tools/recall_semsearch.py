"""End-to-end retrieval quality of the semantic-search facade (r9
VERDICT directive 3): recall@k of the chunk->embed->IVF composition
against brute force on the SAME chunk embeddings, swept over n_probes,
with wave latency beside each point.

Ground truth is the index itself probed at EVERY cell
(``search_chunks_many`` with n_probes = n_cells): ivf_search_index is
exact within the probed cells, so probing all cells IS brute-force
cosine over the identical quantized vectors -- no second embedding
path whose drift could masquerade as index error.

Queries are mid-document snippets (12 words starting at word 20) from
every ``query_every``-th document: the "find the passage I half
remember" workload, where the embedding space should place the source
chunk on top.

Usage: python tools/recall_semsearch.py [--sf /root/testdata/sf0.1]
Prints one table row per n_probes; paste into SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--query-every", type=int, default=75)
    ap.add_argument("--probes", default="1,2,4")
    ap.add_argument("--kmeans-stride", type=int, default=50)
    ap.add_argument("--kmeans-iters", type=int, default=1)
    args = ap.parse_args()

    from pg_auto_dw_spark.functions.semsearch import (
        build_chunk_search_index,
        search_chunks_many,
    )
    from pg_auto_dw_spark.functions.similarity import ann_recall_summary
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark()
    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="semsearch_recall_"))

    t0 = time.perf_counter()
    stats = build_chunk_search_index(
        wh, docs, "idx",
        kmeans_stride=args.kmeans_stride,
        kmeans_iters=args.kmeans_iters,
    )
    build_s = time.perf_counter() - t0
    print(
        f"index: {stats['chunks']} chunks, {stats['cells']} cells, "
        f"build {build_s:.1f}s"
    )

    queries = {
        int(r["doc_id"]): " ".join(r["text"].split()[20:32])
        for r in docs.collect()
        if r["doc_id"] % args.query_every == 0 and r["text"]
    }
    print(f"{len(queries)} queries (12-word mid-doc snippets)")

    def run(n_probes: int):
        t = time.perf_counter()
        out = search_chunks_many(
            wh, "idx", queries, k=args.k, n_probes=n_probes
        ).withColumnRenamed("doc_id", "neighbor_doc")
        rows = out.collect()
        return rows, time.perf_counter() - t

    exact_rows, exact_s = run(int(stats["cells"]))
    exact = spark.createDataFrame(
        [(r["query_id"], r["neighbor_doc"] * (1 << 20) + r["chunk_id"]) for r in exact_rows],
        "query_id bigint, neighbor_id bigint",
    )
    # sanity: the source document should be brute-force findable
    src_hit = len(
        {r["query_id"] for r in exact_rows if r["query_id"] == r["neighbor_doc"]}
    )
    print(
        f"brute force (n_probes={stats['cells']}): wave {exact_s:.2f}s; "
        f"source doc in exact top-{args.k} for {src_hit}/{len(queries)} queries"
    )

    print(f"{'n_probes':>8} {'macro_recall':>12} {'min_recall':>10} "
          f"{'frac_perfect':>12} {'wave_sec':>8}")
    for n_probes in [int(x) for x in args.probes.split(",")]:
        rows, wave_s = run(n_probes)
        approx = spark.createDataFrame(
            [(r["query_id"], r["neighbor_doc"] * (1 << 20) + r["chunk_id"]) for r in rows],
            "query_id bigint, neighbor_id bigint",
        )
        s = ann_recall_summary(approx, exact).first()
        print(
            f"{n_probes:>8} {s['macro_recall']:>12.4f} {s['min_recall']:>10.4f} "
            f"{s['frac_perfect']:>12.4f} {wave_s:>8.2f}"
        )


if __name__ == "__main__":
    main()
