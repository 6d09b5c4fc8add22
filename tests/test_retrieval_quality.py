"""Retrieval-mining quality floors (r10 VERDICT #3): the measured
mining-quality numbers from tools/probe_retrieval_quality.py, pinned
so regressions in the margin guard / mutual-best rule fail loudly --
the mining twin of test_semsearch.py's recall floor.

Fixture: tools/probe_retrieval_quality.py's structured corpora (5
clusters with 39 unlabeled near-positives per query; a planted
parallel corpus with centroid hubs). Full sweep numbers in SCALE.md
round 11."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.retrieval import (
    ivf_search_frame,
    margin_score_pairs,
    mine_hard_negatives,
)
from pg_auto_dw_spark.functions.similarity import build_ivf_index
from pg_auto_dw_spark.warehouse import Warehouse
from tools.probe_retrieval_quality import (
    DIMS,
    N_CLUSTERS,
    N_PAIRS,
    N_PER,
    bitext_vectors,
    hardneg_corpus,
    hardneg_queries,
)


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    return Warehouse(spark, str(tmp_path_factory.mktemp("rq_wh")))


@pytest.fixture(scope="module")
def hardneg_hits(spark, wh):
    corpus = hardneg_corpus(spark)
    build_ivf_index(wh, corpus, "hn", stride=20, iters=2, dims=DIMS,
                    seed_hash=True)
    queries, positives = hardneg_queries(spark)
    hits = ivf_search_frame(
        wh, "hn", queries, k=60, n_probes=max(1, N_CLUSTERS * N_PER // 20)
    ).localCheckpoint(eager=True)
    return hits, positives, queries.count()


def _contamination(negs):
    rows = negs.select(
        (F.floor((F.col("query_id") - 9000) / 100)
         == F.floor(F.col("negative_id") / 1000)).alias("same_cluster"),
    ).collect()
    return (
        sum(1 for r in rows if r["same_cluster"]) / len(rows),
        len(rows),
    )


def test_margin_guard_removes_unlabeled_positives(hardneg_hits):
    """Measured: no guard -> 0.66 contamination (39 unlabeled
    same-cluster positives per query ride into the negatives); margin
    0.95 -> 0.018. Floors: <= 0.05 guarded, >= 0.5 unguarded, with
    yield still >= 15 true negatives per query under the guard."""
    hits, positives, n_queries = hardneg_hits
    raw_contam, _ = _contamination(
        mine_hard_negatives(hits, positives, margin=None)
    )
    assert raw_contam >= 0.5
    guarded_contam, n = _contamination(
        mine_hard_negatives(hits, positives, margin=0.95)
    )
    assert guarded_contam <= 0.05
    assert n / n_queries >= 15


def test_margin_sweep_monotone(hardneg_hits):
    """Tightening the margin must never ADD contamination (measured
    0.66 / 0.375 / 0.22 / 0.018 / 0.0 at None/1.0/0.98/0.95/0.9)."""
    hits, positives, _ = hardneg_hits
    prev = 1.1
    for margin in (None, 1.0, 0.98, 0.95, 0.9):
        contam, n = _contamination(
            mine_hard_negatives(hits, positives, margin=margin)
        )
        assert n > 0
        assert contam <= prev + 1e-9
        prev = contam


@pytest.fixture(scope="module")
def bitext_frames(spark, wh):
    src, tgt = bitext_vectors(spark)
    build_ivf_index(wh, tgt, "bt_tgt", stride=12, iters=2, dims=DIMS,
                    seed_hash=True)
    build_ivf_index(wh, src, "bt_src", stride=12, iters=2, dims=DIMS,
                    seed_hash=True)
    fwd = ivf_search_frame(
        wh, "bt_tgt", src.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=8, n_probes=8,
    ).localCheckpoint(eager=True)
    bwd = ivf_search_frame(
        wh, "bt_src", tgt.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=8, n_probes=8,
    ).localCheckpoint(eager=True)
    return fwd, bwd


def _score(rows):
    n = len(rows)
    true = sum(1 for r in rows if r["src_id"] == r["tgt_id"])
    hubs = sum(1 for r in rows if r["tgt_id"] >= 900)
    return n, (true / n if n else 0.0), true / N_PAIRS, hubs


def test_bitext_mutual_margin_precision_floor(bitext_frames):
    """Measured at threshold 1.03 + mutual: precision 0.984, recall
    1.0, 1 hub pair (of 63). Floors: precision >= 0.95, recall >=
    0.95, hub pairs <= 2."""
    fwd, bwd = bitext_frames
    n, prec, rec, hubs = _score(
        margin_score_pairs(fwd, bwd, threshold=1.03, mutual=True).collect()
    )
    assert n > 0 and prec >= 0.95 and rec >= 0.95 and hubs <= 2


def test_mutual_rule_earns_its_precision(bitext_frames):
    """Measured at 1.05: mutual precision 1.0 vs 0.31 without the
    mutual-best rule at the same threshold."""
    fwd, bwd = bitext_frames
    _, prec_mutual, _, _ = _score(
        margin_score_pairs(fwd, bwd, threshold=1.05, mutual=True).collect()
    )
    _, prec_free, _, _ = _score(
        margin_score_pairs(fwd, bwd, threshold=1.05, mutual=False).collect()
    )
    assert prec_mutual >= 0.99
    assert prec_mutual > prec_free + 0.3


def test_margin_beats_absolute_cosine_on_hubs(bitext_frames):
    """The criterion's reason to exist: an absolute-cosine cut that
    passes every true pair admits 27 hub pairs (precision 0.22);
    margin >= 1.05 admits zero."""
    fwd, bwd = bitext_frames
    base = fwd.filter(F.col("cosine") >= 0.93).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
    ).collect()
    _, base_prec, base_rec, base_hubs = _score(base)
    assert base_rec >= 0.99  # the cut passes the true pairs...
    assert base_hubs >= 10  # ...and floods in hubs
    _, _, _, margin_hubs = _score(
        margin_score_pairs(fwd, bwd, threshold=1.05, mutual=True).collect()
    )
    assert margin_hubs == 0


def test_first_true_negative_rank(hardneg_hits):
    """The rank-distribution lens: unguarded, the first TRUE negative
    sits at mean rank ~40 (a hardest-8 miner would train on false
    negatives exclusively); at the 0.95 default it must sit at mean
    rank <= 2."""
    hits, positives, _ = hardneg_hits

    def mean_first_true(negs):
        rows = negs.select(
            "query_id", "negative_id", "neg_rank",
            (F.floor((F.col("query_id") - 9000) / 100)
             == F.floor(F.col("negative_id") / 1000)).alias("same_cluster"),
        ).collect()
        first = {}
        for r in rows:
            if not r["same_cluster"]:
                q = r["query_id"]
                first[q] = min(first.get(q, 10**9), r["neg_rank"])
        return sum(first.values()) / len(first)

    raw = mean_first_true(mine_hard_negatives(hits, positives, margin=None))
    guarded = mean_first_true(mine_hard_negatives(hits, positives, margin=0.95))
    assert raw >= 10
    assert guarded <= 2
