"""Distributed quality-classifier TRAINING (functions/selection.py
train_linear_classifier): full-batch logistic regression over the
hashed bag-of-words features, serving-compatible with
hashed_linear_score."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.selection import (
    hashed_linear_score,
    train_linear_classifier,
)

GOOD = ("thorough careful measured precise documented reviewed tested "
        "verified sourced cited balanced rigorous").split()
BAD = ("spam clickbait scam hoax garbage junk lottery miracle viral "
       "shocking unbelievable free").split()


def _docs(spark, words, n, offset):
    rows = [
        (offset + i,
         " ".join(words[(i + j) % len(words)] for j in range(8)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def trained(spark):
    pos = _docs(spark, GOOD, 30, 0)
    neg = _docs(spark, BAD, 30, 1000)
    weights, losses = train_linear_classifier(
        pos, neg, buckets=512, iters=20, lr=8.0
    )
    return pos, neg, weights, losses


def test_loss_descends_monotonically(trained):
    _, _, _, losses = trained
    assert len(losses) == 20
    assert losses[0] == pytest.approx(math.log(2), rel=1e-6)  # w=0 start
    assert all(b < a for a, b in zip(losses, losses[1:]))
    assert losses[-1] < 0.2


def test_trained_weights_separate_held_out_docs(spark, trained):
    """The serving composition: weights from the trainer plug into
    hashed_linear_score and rank unseen good docs strictly above
    unseen bad docs (disjoint ids, rotated word windows)."""
    _, _, weights, _ = trained
    held_pos = _docs(spark, GOOD, 10, 5000)
    held_neg = _docs(spark, BAD, 10, 6000)
    both = held_pos.unionByName(held_neg)
    scores = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_score(both, weights, buckets=512).collect()
    }
    pos_scores = [scores[5000 + i] for i in range(10)]
    neg_scores = [scores[6000 + i] for i in range(10)]
    assert min(pos_scores) > max(neg_scores)


def test_matches_python_reference(spark):
    """Three iterations must track a pure-Python full-batch GD on the
    identical features (same md5 hashing, same normalization, same
    step rule) within float-sum tolerance."""
    pos = _docs(spark, GOOD, 8, 0)
    neg = _docs(spark, BAD, 8, 100)
    buckets, iters, lr = 128, 3, 2.0
    _, losses = train_linear_classifier(
        pos, neg, buckets=buckets, iters=iters, lr=lr
    )

    def feats(text):
        toks = [t for t in
                "".join(c if c.isalnum() else " " for c in text.lower()).split()
                if t]
        counts = {}
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % buckets
            counts[b] = counts.get(b, 0) + 1
        n = sum(counts.values())
        return {b: c / n for b, c in counts.items()}

    rows = [(feats(r["text"]), 1.0) for r in pos.collect()] + [
        (feats(r["text"]), 0.0) for r in neg.collect()
    ]
    w = [0.0] * buckets
    bias = 0.0
    ref_losses = []
    for _ in range(iters):
        loss = gbias = 0.0
        grad = [0.0] * buckets
        for x, y in rows:
            s = sum(w[b] * v for b, v in x.items()) + bias
            p = 1.0 / (1.0 + math.exp(-s))
            pc = min(max(p, 1e-12), 1 - 1e-12)
            loss += -(y * math.log(pc) + (1 - y) * math.log(1 - pc))
            r = p - y
            gbias += r
            for b, v in x.items():
                grad[b] += r * v
        ref_losses.append(loss / len(rows))
        for b in range(buckets):
            w[b] -= lr * grad[b] / len(rows)
        bias -= lr * gbias / len(rows)
    for got, want in zip(losses, ref_losses):
        assert got == pytest.approx(want, rel=1e-9)


def test_empty_training_set_raises(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no tokenized"):
        train_linear_classifier(empty, empty, buckets=64, iters=1)


def test_train_score_sample_composition(spark, trained):
    """The full curation loop the trainer exists for: train the filter
    on seed sets -> score an unseen corpus with hashed_linear_score ->
    quality_binned_sample keeps the high-quality bin whole and
    decimates the low one."""
    from pg_auto_dw_spark.functions.sampling import quality_binned_sample

    _, _, weights, _ = trained
    corpus = _docs(spark, GOOD, 40, 20000).unionByName(
        _docs(spark, BAD, 40, 30000)
    )
    scored = hashed_linear_score(corpus, weights, buckets=512)
    good = [r["score"] for r in scored.filter(F.col("doc_id") < 30000).collect()]
    bad = [r["score"] for r in scored.filter(F.col("doc_id") >= 30000).collect()]
    cut = (min(good) + max(bad)) / 2  # the operating threshold
    sampled = quality_binned_sample(
        scored, key_col="doc_id", score_col="score",
        thresholds=[cut], rates=[0.1, 1.0],
    ).collect()
    kept_good = sum(1 for r in sampled if r["doc_id"] < 30000)
    kept_bad = sum(1 for r in sampled if r["doc_id"] >= 30000)
    assert kept_good == 40  # the high bin survives whole
    assert kept_bad <= 12  # the low bin is decimated (~10% +- hash noise)
    assert all(
        (r["quality_bin"] == 1) == (r["doc_id"] < 30000) for r in sampled
    )


def test_id_collision_across_seed_sets(spark):
    """The same id in BOTH seed sets (independent corpora) must train
    as two examples: per-(id, label) normalization and gradient keys,
    never pooled or cross-producted. Identical to training on the same
    docs with disjoint ids."""
    pos = _docs(spark, GOOD, 6, 0)
    neg_collide = _docs(spark, BAD, 6, 0)  # SAME ids 0..5
    neg_disjoint = _docs(spark, BAD, 6, 500)
    _, losses_collide = train_linear_classifier(
        pos, neg_collide, buckets=128, iters=3, lr=2.0
    )
    _, losses_disjoint = train_linear_classifier(
        pos, neg_disjoint, buckets=128, iters=3, lr=2.0
    )
    for a, b in zip(losses_collide, losses_disjoint):
        assert a == pytest.approx(b, rel=1e-9)
