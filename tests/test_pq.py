"""Product quantization (pq.py): codebook/codes invariants, ADC
determinism, duplicate retrieval through the compressed path, and the
recall ladder (ADC-only < ADC+exact-rerank) measured with the
ann_recall harness against brute force."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.pq import pq_encode, pq_topk, pq_train
from pg_auto_dw_spark.functions.similarity import (
    ann_recall_summary,
    brute_force_topk,
)
from pg_auto_dw_spark.sources import load_table

M, KSUB = 8, 16


def test_pq_codebook_and_codes_invariants(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=M, ksub=KSUB, iters=1)
    rows = cb.collect()
    assert len(rows) <= M * KSUB
    assert len({(r["sub"], r["code"]) for r in rows}) == len(rows)
    assert all(0 <= r["sub"] < M and 0 <= r["code"] < KSUB for r in rows)
    assert all(len(r["cv"]) == 64 // M for r in rows)
    assert all(r["cn"] == sum(x * x for x in r["cv"]) for r in rows)
    enc = pq_encode(emb, cb, m=M, ksub=KSUB).collect()
    assert len(enc) == emb.count()
    assert all(len(r["codes"]) == M for r in enc)
    assert all(0 <= c < KSUB for r in enc for c in r["codes"])
    # codes are a pure function of (vector, codebook): bit-identical
    # across input partitionings
    enc2 = pq_encode(emb.repartition(7), cb, m=M, ksub=KSUB).collect()
    assert {r["id"]: list(r["codes"]) for r in enc} == {
        r["id"]: list(r["codes"]) for r in enc2
    }


def test_pq_rerank_finds_planted_duplicate(spark, sf_dir):
    """An exact duplicate vector has identical codes, so ADC scores it
    at the query's own reconstruction ceiling -> it always makes the
    shortlist, and the exact re-rank pins it at cosine ~1 rank 1."""
    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(77777).cast("bigint")
    )
    with_dup = emb.unionByName(dup)
    top = pq_topk(with_dup, [0], k=1, m=M, ksub=KSUB, rerank=16).collect()
    assert top[0]["neighbor_id"] == 77777
    assert abs(top[0]["cosine"] - 1.0) < 1e-9


def test_pq_recall_ladder_vs_brute_force(spark, sf_dir):
    """ADC over 16-centroid/8-subspace codes is lossy; exact re-rank of
    the ADC shortlist recovers most of the exact top-3. Thresholds are
    generous: every stage is bit-deterministic (integer codes, exact
    LUT sums), so flakiness can only come from regenerated testdata."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(10))
    cb = pq_train(emb, m=M, ksub=KSUB, iters=1)
    enc = pq_encode(emb, cb, m=M, ksub=KSUB)
    exact = brute_force_topk(emb, query_ids=qids, k=3)
    adc = pq_topk(emb, qids, k=3, codebook=cb, encoded=enc)
    rr = pq_topk(emb, qids, k=3, rerank=32, codebook=cb, encoded=enc)
    s_adc = ann_recall_summary(adc, exact).collect()[0]
    s_rr = ann_recall_summary(rr, exact).collect()[0]
    assert s_adc["n_queries"] == 10 and s_rr["n_queries"] == 10
    assert s_adc["macro_recall"] >= 0.15  # lossy but far above random
    assert s_rr["macro_recall"] >= 0.55
    assert s_rr["macro_recall"] >= s_adc["macro_recall"]
    # rerank emits exact cosines: every returned score must match the
    # brute-force score for the same pair
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, query_ids=qids, k=50).collect()
    }
    for r in rr.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine"] - exact_scores[key]) < 1e-12


def test_pq_topk_deterministic_across_partitionings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=M, ksub=KSUB, iters=1)
    a = pq_topk(emb, [0, 1, 2], k=3, codebook=cb).collect()
    b = pq_topk(emb.repartition(5), [0, 1, 2], k=3, codebook=cb).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


import pytest

from pg_auto_dw_spark.functions.pq import build_ivf_pq_index, ivf_pq_search_index
from pg_auto_dw_spark.functions.similarity import build_ivf_index, ivf_search_index
from pg_auto_dw_spark.warehouse import Warehouse


@pytest.fixture(scope="module")
def pq_indexed(spark, sf_dir, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("pqwh")))
    emb = load_table(spark, sf_dir, "embeddings")
    stats = build_ivf_pq_index(wh, emb, "pq.emb", stride=50, iters=1, m=M, ksub=KSUB)
    return wh, emb, stats


def test_ivf_pq_build_writes_three_tables(pq_indexed):
    wh, emb, stats = pq_indexed
    assert stats["vectors"] == emb.count()
    assert stats["cells"] > 0 and stats["pq_cells"] <= M * KSUB
    for t in ("pq.emb.codebook", "pq.emb.pq_codebook", "pq.emb.codes"):
        assert wh.exists(t)
    assert wh._partitioning["pq.emb.codes"] == ["cell"]
    # the combined kernel's cell assignment matches the uncompressed
    # index build exactly (same math, same tie rule)
    wh2 = Warehouse(wh.spark, wh.root + "_twin")
    build_ivf_index(wh2, emb, "twin.emb", stride=50, iters=1)
    want = {
        (r["vec_id"], r["cell"])
        for r in wh2.read("twin.emb.assignment").select("vec_id", "cell").collect()
    }
    got = {
        (r["id"], r["cell"])
        for r in wh.read("pq.emb.codes").select("id", "cell").collect()
    }
    assert got == want


def test_ivf_pq_search_finds_exact_vector(pq_indexed):
    """An external query equal to a stored vector probes that vector's
    own cell (identical quantization path), ADC ranks identical codes
    at the ceiling, and the exact re-rank returns cosine 1.0."""
    wh, emb, _ = pq_indexed
    planted = emb.filter(F.col("vec_id") == 7).collect()[0]
    top = ivf_pq_search_index(
        wh, "pq.emb", [(9001, list(planted["embedding"]))],
        k=1, rerank=16, corpus=emb, m=M, ksub=KSUB,
    ).collect()
    assert top[0]["query_id"] == 9001
    assert top[0]["neighbor_id"] == 7
    assert abs(top[0]["cosine"] - 1.0) < 1e-9


def test_ivf_pq_full_rerank_matches_uncompressed_search(pq_indexed, spark, sf_dir, tmp_path_factory):
    """With a shortlist covering every candidate in the probed cells,
    ADC ordering is irrelevant and the exact re-rank must reproduce
    the uncompressed ivf_search_index result pair-for-pair."""
    wh, emb, _ = pq_indexed
    wh2 = Warehouse(spark, str(tmp_path_factory.mktemp("unc")))
    build_ivf_index(wh2, emb, "unc.emb", stride=50, iters=1)
    qs = [
        (100 + r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_search_index(wh2, "unc.emb", qs, k=3, n_probes=2).collect()
    }
    got_rows = ivf_pq_search_index(
        wh, "pq.emb", qs, k=3, n_probes=2, rerank=100000, corpus=emb, m=M, ksub=KSUB
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    assert got == want
    # and the re-ranked cosines are the exact ones
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ivf_search_index(wh2, "unc.emb", qs, k=3, n_probes=2).collect()
    }
    for r in got_rows:
        assert abs(r["cosine"] - exact[(r["query_id"], r["neighbor_id"])]) < 1e-12


def test_ivf_pq_search_scan_partition_prunes(pq_indexed):
    wh, emb, _ = pq_indexed
    planted = emb.filter(F.col("vec_id") == 3).collect()[0]
    df = ivf_pq_search_index(wh, "pq.emb", [(1, list(planted["embedding"]))], k=2, m=M, ksub=KSUB)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
