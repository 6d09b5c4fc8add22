"""Retrieval-mining quality harness (r10 VERDICT #3): measured quality
numbers for mine_hard_negatives and margin_score_pairs on structured
fixtures -- the mining twin of the semsearch recall curve.

Part A -- hard-negative mining: a 5-cluster corpus where each query has
ONE labeled positive and 39 UNLABELED same-cluster near-positives (the
false-negative poison real mining faces). Sweeping the multiplicative
margin measures the trade: contamination (fraction of mined negatives
that are actually same-cluster) vs yield (negatives kept per query).

Part B -- bitext mining: a planted parallel corpus (target i = rotated
source i) with hub targets sitting at each cluster centroid (close to
EVERYTHING in the cluster -- what absolute-cosine mining admits).
Sweeping the Artetxe-Schwenk margin threshold measures mutual-best
pair precision/recall and hub admissions vs a raw-cosine baseline.

Run: python tools/probe_retrieval_quality.py
The floor pins live in tests/test_retrieval_quality.py; the measured
table goes to SCALE.md round 11.
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = 5
N_PER = 40
DIMS = 16


def hardneg_corpus(spark):
    """5 clusters x 40 docs: axis-c spine + deterministic wiggle dims
    giving in-cluster cosines ~0.9-0.99 and cross-cluster ~0.0-0.1."""
    rows = []
    for c in range(N_CLUSTERS):
        for i in range(N_PER):
            v = [0.0] * DIMS
            v[c] = 1.0
            v[5 + (i % 5)] = 0.30 + 0.05 * (i % 4)
            v[10 + (i % 3)] = 0.10 + 0.02 * (i % 7)
            rows.append((c * 1000 + i, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def hardneg_queries(spark):
    """8 queries per cluster: member i's vector with a small extra
    nudge (so it is not a byte-identical corpus vector); the labeled
    positive is same-cluster member i+8."""
    rows, positives = [], []
    for c in range(N_CLUSTERS):
        for i in range(8):
            v = [0.0] * DIMS
            v[c] = 1.0
            v[5 + (i % 5)] = 0.30 + 0.05 * (i % 4)
            v[10 + (i % 3)] = 0.10 + 0.02 * (i % 7)
            v[15] = 0.05
            qid = 9000 + c * 100 + i
            rows.append((qid, v))
            positives.append((qid, c * 1000 + i + 8))
    q = spark.createDataFrame(rows, "query_id bigint, embedding array<double>")
    p = spark.createDataFrame(positives, "query_id bigint, positive_id bigint")
    return q, p


def mine_sweep(spark, wh):
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.retrieval import (
        ivf_search_frame,
        mine_hard_negatives,
    )
    from pg_auto_dw_spark.functions.similarity import build_ivf_index

    corpus = hardneg_corpus(spark)
    build_ivf_index(wh, corpus, "hn", stride=20, iters=2, dims=DIMS,
                    seed_hash=True)
    queries, positives = hardneg_queries(spark)
    # k=60 so every frame holds the whole home cluster (40) plus ~20
    # cross-cluster rows -- the frame a real miner would request
    # (depth > expected positive rank); n_probes covers all cells so
    # the sweep measures the MINING trade, not index recall
    hits = ivf_search_frame(
        wh, "hn", queries, k=60, n_probes=max(1, N_CLUSTERS * N_PER // 20)
    ).localCheckpoint(eager=True)
    n_queries = queries.count()
    out = {}
    for margin in (None, 1.0, 0.98, 0.95, 0.9, 0.8):
        negs = mine_hard_negatives(hits, positives, margin=margin)
        rows = negs.select(
            "query_id", "negative_id", "neg_rank",
            (F.floor((F.col("query_id") - 9000) / 100)
             == F.floor(F.col("negative_id") / 1000)).alias("same_cluster"),
        ).collect()
        n = len(rows)
        contam = sum(1 for r in rows if r["same_cluster"]) / n if n else 0.0
        # rank distribution: where do TRUE negatives sit in the mined
        # ranking? rank 1 = the hardest example training actually uses;
        # a guard that worked pushed true negatives to the top ranks
        true_neg_top3 = sum(
            1 for r in rows if not r["same_cluster"] and r["neg_rank"] <= 3
        )
        first_true = {}
        for r in rows:
            if not r["same_cluster"]:
                q = r["query_id"]
                first_true[q] = min(first_true.get(q, 10**9), r["neg_rank"])
        mean_first_true = (
            round(sum(first_true.values()) / len(first_true), 2)
            if first_true else None
        )
        out[str(margin)] = {
            "negs_per_query": round(n / n_queries, 2),
            "contamination": round(contam, 4),
            "mean_rank_of_first_true_negative": mean_first_true,
            "true_negatives_in_top3": true_neg_top3,
        }
    return out


N_PAIRS = 60


def bitext_vectors(spark):
    """3-cluster parallel corpus: target i is source i rotated into a
    spare dim (cos ~0.995); 3 hub targets sit exactly on each cluster
    centroid (cos ~0.9 to EVERY cluster member)."""
    src, tgt = [], []
    for i in range(N_PAIRS):
        c = i % 3
        v = [0.0] * DIMS
        v[c] = 1.0
        v[5 + (i % 5)] = 0.30 + 0.05 * (i % 4)
        v[10 + (i % 3)] = 0.10 + 0.02 * (i % 7)
        src.append((i, v))
        w = list(v)
        w[15] = 0.10  # the "translation" rotation
        tgt.append((i, w))
    for c in range(3):
        h = [0.0] * DIMS
        h[c] = 1.0
        h[5] = 0.15
        h[10] = 0.05  # near the cluster centroid: close to everything
        tgt.append((900 + c, h))
    s = spark.createDataFrame(src, "vec_id bigint, embedding array<double>")
    t = spark.createDataFrame(tgt, "vec_id bigint, embedding array<double>")
    return s, t


def bitext_sweep(spark, wh):
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.retrieval import (
        ivf_search_frame,
        margin_score_pairs,
    )
    from pg_auto_dw_spark.functions.similarity import build_ivf_index

    src, tgt = bitext_vectors(spark)
    build_ivf_index(wh, tgt, "bt_tgt", stride=12, iters=2, dims=DIMS,
                    seed_hash=True)
    build_ivf_index(wh, src, "bt_src", stride=12, iters=2, dims=DIMS,
                    seed_hash=True)
    probes = 8  # cover all cells: exact neighborhoods for the sweep
    fwd = ivf_search_frame(
        wh, "bt_tgt", src.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=8, n_probes=probes,
    ).localCheckpoint(eager=True)
    bwd = ivf_search_frame(
        wh, "bt_src", tgt.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=8, n_probes=probes,
    ).localCheckpoint(eager=True)

    def score(pairs):
        rows = pairs.collect()
        n = len(rows)
        true = sum(1 for r in rows if r["src_id"] == r["tgt_id"])
        hubs = sum(1 for r in rows if r["tgt_id"] >= 900)
        return {
            "pairs": n,
            "precision": round(true / n, 4) if n else None,
            "recall": round(true / N_PAIRS, 4),
            "hub_pairs": hubs,
        }

    out = {}
    for thr in (1.0, 1.03, 1.05, 1.1):
        out[f"margin>={thr},mutual"] = score(
            margin_score_pairs(fwd, bwd, threshold=thr, mutual=True)
        )
    out["margin>=1.05,no-mutual"] = score(
        margin_score_pairs(fwd, bwd, threshold=1.05, mutual=False)
    )
    # the absolute-cosine baseline margin mining replaces: admit any
    # forward pair with cosine >= 0.93 (picked to pass every true
    # pair) -- hubs ride in because nothing normalizes by neighborhood
    base = fwd.filter(F.col("cosine") >= 0.93).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        "cosine",
    )
    out["cosine>=0.93 baseline"] = score(base)
    return out


def main():
    from pg_auto_dw_spark.session import get_spark
    from pg_auto_dw_spark.warehouse import Warehouse

    spark = get_spark("probe-retrieval-quality")
    tmp = tempfile.mkdtemp(prefix="rq_")
    try:
        wh = Warehouse(spark, tmp)
        report = {
            "hard_negatives_margin_sweep": mine_sweep(spark, wh),
            "bitext_threshold_sweep": bitext_sweep(spark, wh),
        }
        print(json.dumps(report, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
