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
