"""Model-based data selection (functions/selection.py): DSIR
importance weights order docs by target-domain likeness, Gumbel-top-n
resampling is deterministic and weight-proportional, hashed linear
scoring matches hand-computed feature sums, and the model-side joins
broadcast (the bounded-by-construction contract)."""

import hashlib

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.selection import (
    CLASSIFIER_BUCKETS,
    dsir_log_weights,
    hashed_linear_score,
    importance_resample,
    synthetic_linear_weights,
)


def _docs(spark):
    # target domain speaks {alpha..delta}; off-domain speaks {omega..}
    rows = []
    for i in range(8):
        rows.append((i, "alpha beta gamma delta alpha beta", "t"))
    for i in range(8, 16):
        rows.append((i, "omega psi chi phi omega psi", "s"))
    rows.append((16, "alpha beta omega psi", "s"))  # mixed, off-domain
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_dsir_weights_order_by_domain_likeness(spark):
    docs = _docs(spark)
    w = {
        r["doc_id"]: r
        for r in dsir_log_weights(docs, F.col("lang") == "t").collect()
    }
    assert w[0]["n_tokens"] == 6
    # target-vocabulary docs outrank off-domain docs; the mixed doc
    # lands strictly between
    assert w[0]["log_weight"] > w[16]["log_weight"] > w[8]["log_weight"]
    # pure function of the corpus: bit-identical across partitionings
    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            docs.repartition(7), F.col("lang") == "t"
        ).collect()
    }
    assert again == {k: v["log_weight"] for k, v in w.items()}


def test_importance_resample_deterministic_and_weight_biased(spark):
    docs = _docs(spark)
    w = dsir_log_weights(docs, F.col("lang") == "t")
    # a dominating weight is always drawn: Gumbel noise is bounded-ish
    # in practice but the test pins the DETERMINISM contract, not tails
    picked = sorted(
        r["doc_id"] for r in importance_resample(w, 5).collect()
    )
    assert len(picked) == 5
    again = sorted(
        r["doc_id"]
        for r in importance_resample(w.repartition(3), 5).collect()
    )
    assert picked == again
    # with weights pushed far apart, selection follows the weights:
    # boost the target stratum by +50 nats -- all 5 picks are target docs
    boosted = w.withColumn(
        "log_weight",
        F.col("log_weight") + F.when(F.col("doc_id") < 8, 50.0).otherwise(0.0),
    )
    top = sorted(r["doc_id"] for r in importance_resample(boosted, 5).collect())
    assert all(d < 8 for d in top)


def test_hashed_linear_score_matches_manual(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha, beta!  ALPHA?")], "doc_id bigint, text string"
    )
    out = hashed_linear_score(docs).collect()[0]

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % CLASSIFIER_BUCKETS

    def wt(b: int) -> int:
        return (b + 1) * 2654435761 % 1_000_003 - 500_000

    toks = ["alpha", "beta", "alpha"]  # word_tokens normalization
    expect = sum(wt(bucket(t)) for t in toks)
    assert out["n_tokens"] == 3
    assert out["w_sum"] == expect
    assert abs(out["score"] - expect / (3 * 1e6)) < 1e-12


def test_selection_model_joins_broadcast(spark):
    """Both scoring joins must broadcast the bounded model side; the
    corpus token stream never shuffles for the join."""
    docs = _docs(spark)
    for df in (
        dsir_log_weights(docs, F.col("lang") == "t"),
        hashed_linear_score(docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


def test_synthetic_weights_bounded_and_stable(spark):
    w = synthetic_linear_weights(spark, 64).collect()
    assert len(w) == 64
    assert all(-500_000 <= r["wt"] < 500_003 for r in w)
    assert len({r["b"] for r in w}) == 64


def test_hashed_embedding_geometry_and_determinism(spark):
    from pg_auto_dw_spark.functions.selection import hashed_embedding

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partition join broadcast"),
            (2, "spark shuffle partition join broadcast"),   # exact dup
            (3, "spark shuffle partition join merge"),        # near dup
            (4, "violin sonata orchestra concerto timpani"),  # disjoint
            (5, "!!! ???"),                                    # no tokens
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in hashed_embedding(docs, dims=32).collect()}
    assert 5 not in rows
    for r in rows.values():
        assert len(r["embedding"]) == 32
        n = sum(x * x for x in r["embedding"])
        assert abs(n - 1.0) < 1e-9  # unit norm

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    e = {k: r["embedding"] for k, r in rows.items()}
    assert abs(cos(e[1], e[2]) - 1.0) < 1e-9          # identical docs
    assert cos(e[1], e[3]) > cos(e[1], e[4])           # near > disjoint
    assert cos(e[1], e[3]) > 0.5
    again = {
        r["doc_id"]: r["embedding"]
        for r in hashed_embedding(docs.repartition(7), dims=32).collect()
    }
    assert again == e  # bit-deterministic across partitionings


def test_hashed_embedding_composes_with_ann_stack(spark):
    """text -> hashed_embedding -> brute_force_topk: the planted
    near-duplicate is its source's nearest neighbor, through the same
    quantized path the precomputed-embedding operators use."""
    from pg_auto_dw_spark.functions.selection import hashed_embedding
    from pg_auto_dw_spark.functions.similarity import brute_force_topk

    base = [
        (i, f"topic{i % 7} term{i} filler words about subject {i % 5}")
        for i in range(30)
    ]
    base.append((100, "topic0 term0 filler words about subject 0 extra"))
    docs = spark.createDataFrame(base, "doc_id bigint, text string")
    emb = hashed_embedding(docs, dims=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top = brute_force_topk(emb, query_ids=[0], k=1).collect()
    assert top[0]["neighbor_id"] == 100
    assert top[0]["cosine"] > 0.8
