"""Winnowing wired into the dedup verifier family (r10 VERDICT #6):
winnow_near_dup_pairs = fingerprint-overlap candidates -> exact
k-shingle Jaccard verify, composed with connected components the way
the MinHash and SimHash families are. Fixture + full sweep in
tools/probe_winnow_dedup.py; numbers in SCALE.md round 11."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.dedup import connected_components
from pg_auto_dw_spark.functions.text import (
    winnow_fingerprints,
    winnow_near_dup_pairs,
    winnow_overlap_pairs,
)
from tools.probe_winnow_dedup import build_docs


@pytest.fixture(scope="module")
def corpus(spark):
    rows, true_pairs, lifted_pairs = build_docs()
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    return docs, true_pairs, lifted_pairs


def test_neardup_verdicts_exact(spark, corpus):
    """At the measured defaults (k=16, w=8, min_shared=2, jaccard
    0.4): exactly the 12 planted near-dup pairs, nothing else -- the
    lifted-sentence and shared-footer pairs are candidate-stage
    witnesses the whole-document verifier must reject."""
    docs, true_pairs, _ = corpus
    got = {
        (r["id_a"], r["id_b"])
        for r in winnow_near_dup_pairs(docs, jaccard_threshold=0.4).collect()
    }
    assert got == true_pairs


def test_candidates_witness_lifted_substrings(spark, corpus):
    """The reason winnowing earns a candidate stage of its own: a ONE
    sentence verbatim lift inside unrelated prose is witnessed (all 4
    base-lift and 4 dup-lift pairs), which gram-set LSH dilutes; and
    at k=16 every candidate shares a real substring (precision 1.0 on
    the probe's substring ground truth, measured in SCALE.md)."""
    docs, true_pairs, lifted_pairs = corpus
    fps = winnow_fingerprints(docs, k=16, w=8)
    cand = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(fps, min_shared=2).collect()
    }
    dup_lifted = {(100 + m, 300 + m) for m in range(len(lifted_pairs))}
    assert lifted_pairs <= cand and dup_lifted <= cand
    n_dups = len(true_pairs)
    footer = {
        (100 + i, 100 + j)
        for i in range(n_dups)
        for j in range(n_dups)
        if i < j
    }
    substring_truth = true_pairs | lifted_pairs | dup_lifted | footer
    assert cand <= substring_truth  # zero noise pairs at k=16
    assert true_pairs <= cand


def test_short_grams_need_min_shared(spark, corpus):
    """k=8 normalized grams (~1.5 English words) collide across
    unrelated prose: min_shared=1 is noisy, min_shared=5 is exact --
    the measured knob guidance in the docstring."""
    docs, true_pairs, lifted_pairs = corpus
    fps = winnow_fingerprints(docs, k=8, w=4)
    noisy = winnow_overlap_pairs(fps, min_shared=1).count()
    tight = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(fps, min_shared=5).collect()
    }
    assert noisy > len(tight) * 1.5
    assert true_pairs <= tight


def test_composes_with_connected_components(spark, corpus):
    """The family contract: verified pairs feed connected_components
    exactly like minhash_lsh_candidates output -- each {base, dup}
    collapses to one min-id cluster, everything else stays singleton."""
    docs, true_pairs, _ = corpus
    pairs = winnow_near_dup_pairs(docs, jaccard_threshold=0.4).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs, nodes=docs, id_col="doc_id")
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    multi = {frozenset(v) for v in clusters.values() if len(v) > 1}
    assert multi == {frozenset(p) for p in true_pairs}
