"""Preference-pair assembly (functions/preference.py): DPO/RLHF pair
construction, best-of-n rejection sampling, degenerate-pair audit."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.preference import (
    best_of_n_filter,
    preference_pair_audit,
    preference_pairs,
)

RATINGS = [
    # prompt 1: clear ranking
    (1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.1),
    # prompt 2: two responses, tied scores (tie -> lower id chosen)
    (2, 20, 0.7), (2, 21, 0.7),
    # prompt 3: single response -> never emits
    (3, 30, 1.0),
]


def _ratings(spark, rows=RATINGS):
    return spark.createDataFrame(
        rows, "prompt_id bigint, response_id bigint, score double"
    )


def test_best_worst(spark):
    got = {
        r["prompt_id"]: r
        for r in preference_pairs(_ratings(spark)).collect()
    }
    assert set(got) == {1, 2}
    assert (got[1]["chosen_id"], got[1]["rejected_id"]) == (10, 12)
    assert got[1]["score_gap"] == pytest.approx(0.8)
    # tied prompt: deterministic orientation, zero gap
    assert (got[2]["chosen_id"], got[2]["rejected_id"]) == (20, 21)
    assert got[2]["score_gap"] == 0.0
    # min_gap drops the tied prompt entirely
    gapped = preference_pairs(_ratings(spark), min_gap=0.05).collect()
    assert {r["prompt_id"] for r in gapped} == {1}


def test_best_rest(spark):
    got = {
        (r["prompt_id"], r["rejected_id"]): r
        for r in preference_pairs(_ratings(spark), strategy="best_rest").collect()
    }
    # the fully-tied prompt 2 emits NOTHING under best_rest: zero-gap
    # pairs are label noise in multi-pair strategies (ADVICE r11)
    assert set(got) == {(1, 11), (1, 12)}
    assert all(r["chosen_id"] == 10 for r in got.values())
    assert all(r["score_gap"] > 0 for r in got.values())


def test_all_pairs_capped_and_gap_ordered(spark):
    rows = [(5, i, float(i)) for i in range(10)]  # 45 ordered pairs
    full = preference_pairs(
        _ratings(spark, rows), strategy="all_pairs", max_pairs_per_prompt=1000
    ).collect()
    assert len(full) == 45
    assert all(r["chosen_score"] > r["rejected_score"] for r in full)
    capped = preference_pairs(
        _ratings(spark, rows), strategy="all_pairs", max_pairs_per_prompt=5
    ).collect()
    assert len(capped) == 5
    # the cap keeps the LARGEST gaps
    assert min(r["score_gap"] for r in capped) >= 7.0


def test_null_score_fails_loudly(spark):
    rows = [(1, 10, 0.5), (1, 11, None)]
    with pytest.raises(Exception, match="NULL score for prompt 1"):
        preference_pairs(_ratings(spark, rows)).collect()


def test_unknown_strategy_raises(spark):
    with pytest.raises(ValueError, match="strategy"):
        preference_pairs(_ratings(spark), strategy="bogus")


def test_best_of_n_filter(spark):
    samples = spark.createDataFrame(
        [(1, 10, 0.2, "a"), (1, 11, 0.9, "b"), (2, 20, 0.5, "c"),
         (2, 21, 0.5, "d")],
        "prompt_id bigint, response_id bigint, score double, response string",
    )
    got = {r["prompt_id"]: r for r in best_of_n_filter(samples).collect()}
    assert got[1]["response_id"] == 11
    assert got[2]["response_id"] == 20  # tie -> first remaining column asc


def test_degenerate_pair_audit(spark):
    responses = spark.createDataFrame(
        [(10, "same text"), (11, "same text"), (12, "different")],
        "response_id bigint, response string",
    )
    ratings = _ratings(spark, [(1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.1)])
    pairs = preference_pairs(ratings, strategy="all_pairs",
                             max_pairs_per_prompt=100)
    audit = preference_pair_audit(pairs, responses).collect()
    assert len(audit) == 1
    row = audit[0]
    assert row["n_pairs"] == 3
    assert row["n_degenerate"] == 1  # (10 chosen, 11 rejected): same text
    assert row["total_gap"] == pytest.approx(0.4 + 0.8 + 0.4)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    scores=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 9),
                  st.integers(-5, 5)),
        min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1]),
    ),
    strategy=st.sampled_from(["best_worst", "best_rest", "all_pairs"]),
)
def test_invariants(spark, scores, strategy):
    """Every strategy: chosen score >= rejected score, gap >= 0 and
    consistent, no self-pairs, at most one pair per prompt for
    best_worst, deterministic under input reordering."""
    rows = [(p, p * 100 + r, float(s)) for p, r, s in scores]
    df = _ratings(spark, rows)
    out = preference_pairs(df, strategy=strategy).collect()
    seen = set()
    for r in out:
        assert r["chosen_id"] != r["rejected_id"]
        assert r["chosen_score"] >= r["rejected_score"]
        assert r["score_gap"] == pytest.approx(
            r["chosen_score"] - r["rejected_score"]
        )
        key = (r["prompt_id"], r["chosen_id"], r["rejected_id"])
        assert key not in seen
        seen.add(key)
    if strategy == "best_worst":
        assert len(out) == len({r["prompt_id"] for r in out})
    # determinism under reversed input order
    out2 = preference_pairs(
        _ratings(spark, rows[::-1]), strategy=strategy
    ).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}


def test_all_pairs_quadratic_guard(spark):
    """A prompt wider than max_responses_per_prompt fails loudly in
    the all_pairs path (the O(n^2) pre-cap fan-out) instead of
    silently materializing; best_worst stays linear and unaffected."""
    rows = [(9, i, float(i)) for i in range(30)]
    with pytest.raises(Exception, match="pre-trim wide"):
        preference_pairs(
            _ratings(spark, rows), strategy="all_pairs",
            max_responses_per_prompt=10,
        ).collect()
    ok = preference_pairs(
        _ratings(spark, rows), strategy="best_worst",
        max_responses_per_prompt=10,
    ).collect()
    assert len(ok) == 1


def test_audit_surfaces_dangling_response_ids(spark):
    """A pair referencing a response id missing from the responses
    table must be COUNTED (n_missing_text), not silently dropped from
    the audit."""
    responses = spark.createDataFrame(
        [(10, "a")], "response_id bigint, response string"
    )  # 11 and 12 are dangling
    ratings = _ratings(spark, [(1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.1)])
    pairs = preference_pairs(ratings, strategy="all_pairs",
                             max_pairs_per_prompt=100)
    row = preference_pair_audit(pairs, responses).collect()[0]
    assert row["n_pairs"] == 3
    assert row["n_missing_text"] == 3  # every pair touches 11 or 12


def test_render_preference_pairs_matches_sft_template(spark):
    """The DPO rendering must be byte-identical to what render_chat
    produces for the same (user, assistant) turns -- one rendering
    convention across SFT and preference data."""
    from pg_auto_dw_spark.functions.preference import render_preference_pairs
    from pg_auto_dw_spark.functions.sft import render_chat

    ratings = _ratings(spark, [(1, 10, 0.9), (1, 11, 0.1)])
    prompts = spark.createDataFrame(
        [(1, "what is the capital of france?")], "prompt_id bigint, prompt string"
    )
    responses = spark.createDataFrame(
        [(10, "paris."), (11, "london, probably.")],
        "response_id bigint, response string",
    )
    out = render_preference_pairs(
        preference_pairs(ratings), prompts, responses
    ).collect()
    assert len(out) == 1
    row = out[0]
    turns = spark.createDataFrame(
        [(1, 0, "user", "what is the capital of france?"),
         (1, 1, "assistant", "paris.")],
        "conv_id bigint, turn_idx bigint, role string, content string",
    )
    want = render_chat(turns).first()["text"]
    assert row["chosen_text"] == want
    assert "london, probably." in row["rejected_text"]
    assert row["rejected_text"].startswith("<|user|>\n")


def test_render_preference_pairs_missing_text_fails(spark):
    from pg_auto_dw_spark.functions.preference import render_preference_pairs

    ratings = _ratings(spark, [(1, 10, 0.9), (1, 11, 0.1)])
    prompts = spark.createDataFrame(
        [(1, "q?")], "prompt_id bigint, prompt string"
    )
    responses = spark.createDataFrame(
        [(10, "a")], "response_id bigint, response string"
    )  # rejected 11 missing
    with pytest.raises(Exception, match="missing rejected text"):
        render_preference_pairs(
            preference_pairs(ratings), prompts, responses
        ).collect()
