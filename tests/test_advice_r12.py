"""Regression pins for the r11 ADVICE findings fixed in r12.

1. preference_pairs: tied (zero-gap) pairs are EXCLUDED from the
   multi-pair strategies (all_pairs, best_rest) even at the default
   min_gap=0.0 -- a tied pair arbitrarily labels the lower-id response
   'chosen', injecting label noise into DPO sets. best_worst keeps its
   documented single tie-marker pair (deterministic orientation).
The other three r11 ADVICE items were documentation contracts
(jobs.py star-cap recall wording, sketch.py single-writer ownership,
eval_summary empty-vs-empty edge) -- verified in source review, no
behavior to pin.
"""

from pg_auto_dw_spark.functions.preference import preference_pairs

TIED = [
    (1, 10, 0.5), (1, 11, 0.5), (1, 12, 0.5),  # fully tied prompt
    (2, 20, 0.9), (2, 21, 0.9), (2, 22, 0.1),  # two-way tie at the top
]


def _df(spark):
    return spark.createDataFrame(
        TIED, "prompt_id bigint, response_id bigint, score double"
    )


def test_all_pairs_drops_ties_at_default_min_gap(spark):
    got = preference_pairs(_df(spark), strategy="all_pairs").collect()
    # prompt 1 emits nothing; prompt 2 emits exactly the two strict
    # pairs (20>22, 21>22) -- never the (20,21) tie
    assert all(r["score_gap"] > 0 for r in got)
    assert {(r["prompt_id"], r["chosen_id"], r["rejected_id"]) for r in got} == {
        (2, 20, 22), (2, 21, 22),
    }


def test_best_rest_drops_ties_at_default_min_gap(spark):
    got = preference_pairs(_df(spark), strategy="best_rest").collect()
    # prompt 1 fully tied -> nothing; prompt 2's best (20, tie-broken
    # on id) pairs only against the strictly-lower 22, not tied 21
    assert {(r["prompt_id"], r["chosen_id"], r["rejected_id"]) for r in got} == {
        (2, 20, 22),
    }
    assert all(r["score_gap"] > 0 for r in got)


def test_best_worst_keeps_single_tie_marker_pair(spark):
    got = {
        r["prompt_id"]: r
        for r in preference_pairs(_df(spark), strategy="best_worst").collect()
    }
    # the documented exception: one stable zero-gap pair per fully-tied
    # prompt (lowest-id chosen, highest-id rejected); min_gap>0 drops it
    assert (got[1]["chosen_id"], got[1]["rejected_id"]) == (10, 12)
    assert got[1]["score_gap"] == 0.0
    gapped = preference_pairs(_df(spark), strategy="best_worst", min_gap=0.05)
    assert {r["prompt_id"] for r in gapped.collect()} == {2}
