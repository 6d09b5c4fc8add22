"""Retrieval-training mining (functions/retrieval.py): distributed
frame search vs the driver-wave searcher, hard-negative mining, and
the Artetxe-Schwenk margin criterion."""

import math

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.retrieval import (
    ivf_search_frame,
    margin_score_pairs,
    mine_hard_negatives,
)
from pg_auto_dw_spark.functions.similarity import build_ivf_index, ivf_search_index
from pg_auto_dw_spark.warehouse import Warehouse


def _clustered_vecs(spark, n_per=20, n_clusters=3, dims=8):
    """Deterministic clustered embeddings: cluster c centered on axis c
    with a small per-id wiggle on a side axis."""
    rows = []
    for c in range(n_clusters):
        for i in range(n_per):
            v = [0.0] * dims
            v[c] = 1.0
            v[(c + 3) % dims] = 0.05 + 0.01 * (i % 5)
            rows.append((c * 1000 + i, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture
def index(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    vecs = _clustered_vecs(spark)
    build_ivf_index(wh, vecs, "ix", stride=10, iters=2, dims=8, seed_hash=True)
    return wh, vecs


def test_frame_search_matches_driver_wave(spark, index):
    """ivf_search_frame must return EXACTLY what ivf_search_index
    returns for the same queries at the same n_probes -- same kernels,
    same tie rules, different distribution shape."""
    wh, vecs = index
    queries = vecs.filter(F.col("vec_id") % 7 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 12))
        for r in ivf_search_frame(wh, "ix", queries, k=3, n_probes=2).collect()
    }
    wave = [(int(r["query_id"]), r["embedding"]) for r in queries.collect()]
    want = {
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 12))
        for r in ivf_search_index(wh, "ix", wave, k=3, n_probes=2).collect()
    }
    assert got == want and got


def test_frame_search_finds_cluster_neighbors(spark, index):
    wh, vecs = index
    queries = spark.createDataFrame(
        [(9001, [1.0, 0.0, 0.0, 0.0, 0.05, 0.0, 0.0, 0.0])],
        "query_id bigint, embedding array<double>",
    )
    hits = ivf_search_frame(wh, "ix", queries, k=5, n_probes=2).collect()
    assert len(hits) == 5
    # every neighbor comes from cluster 0 (ids 0..19)
    assert all(0 <= r["neighbor_id"] < 1000 for r in hits)


def test_mine_hard_negatives(spark):
    hits = spark.createDataFrame(
        [
            (1, 10, 0.99),  # the known positive
            (1, 11, 0.97),  # too close to the positive: margin-dropped
            (1, 12, 0.80),  # hard negative
            (1, 13, 0.70),  # hard negative
            (2, 20, 0.90),  # query 2's positive never in top-k: all kept
        ],
        "query_id bigint, neighbor_id bigint, cosine double",
    )
    positives = spark.createDataFrame(
        [(1, 10), (2, 99)], "query_id bigint, positive_id bigint"
    )
    out = mine_hard_negatives(hits, positives, margin=0.95).collect()
    got = {(r["query_id"], r["negative_id"]): r for r in out}
    assert set(got) == {(1, 12), (1, 13), (2, 20)}
    assert got[(1, 12)]["neg_rank"] == 1 and got[(1, 13)]["neg_rank"] == 2
    # max_negatives keeps the hardest
    capped = mine_hard_negatives(
        hits, positives, margin=0.95, max_negatives=1
    ).collect()
    assert {(r["query_id"], r["negative_id"]) for r in capped} == {(1, 12), (2, 20)}


def test_margin_score_pairs_suppresses_hub(spark):
    """A hub close to EVERYTHING gets a low margin despite high cosine;
    an isolated mutual pair clears the threshold."""
    fwd = spark.createDataFrame(
        [
            # x=1 <-> y=101: isolated pair, dominant cosine
            (1, 101, 0.90), (1, 102, 0.30), (1, 103, 0.25),
            # x=2 -> hub y=102, but x=2 is close to many targets
            (2, 102, 0.85), (2, 101, 0.80), (2, 103, 0.82),
        ],
        "query_id bigint, neighbor_id bigint, cosine double",
    )
    bwd = spark.createDataFrame(
        [
            (101, 1, 0.90), (101, 2, 0.35),
            (102, 2, 0.85), (102, 1, 0.80),
            (103, 2, 0.82), (103, 1, 0.75),
        ],
        "query_id bigint, neighbor_id bigint, cosine double",
    )
    out = {
        (r["src_id"], r["tgt_id"]): r
        for r in margin_score_pairs(fwd, bwd, threshold=1.2).collect()
    }
    assert (1, 101) in out
    m = out[(1, 101)]["margin"]
    assert abs(m - 2 * 0.90 / ((0.90 + 0.30 + 0.25) / 3 + (0.90 + 0.35) / 2)) < 1e-9
    assert (2, 102) not in out  # hub suppressed by its own neighborhood
