"""Eval scoring (functions/evalscore.py): SQuAD-convention EM + token
F1 with MULTISET intersection, pinned against hand math and a pure
Python reference under hypothesis."""

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pg_auto_dw_spark.functions.evalscore import eval_scores, eval_summary


def py_f1(pred: str, ref: str) -> float:
    def norm(s):
        s = re.sub(r"[^a-z0-9\s]", " ", s.lower())
        return re.sub(r"\s+", " ", s).strip()

    p, r = norm(pred).split() if norm(pred) else [], None
    r = norm(ref).split() if norm(ref) else []
    if not p and not r:
        return 1.0
    common = sum((Counter(p) & Counter(r)).values())
    return 2.0 * common / (len(p) + len(r))


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "example_id bigint, prediction string, reference string"
    )


def test_hand_cases(spark):
    rows = [
        (1, "The Eiffel Tower!", "the eiffel tower"),   # EM after norm
        (2, "paris france", "paris"),                    # partial
        (3, "a a a", "a"),                               # multiset: min counts
        (4, "", ""),                                     # both empty
        (5, "something", ""),                            # one empty
    ]
    out = {r["example_id"]: r for r in eval_scores(_rows(spark, rows)).collect()}
    assert out[1]["exact_match"] is True and out[1]["f1"] == 1.0
    assert out[2]["exact_match"] is False
    assert abs(out[2]["f1"] - 2 * 1 / (2 + 1)) < 1e-12
    # multiset: common = min(3, 1) = 1, not set-intersection 1-of-1
    assert out[3]["n_common_tokens"] == 1
    assert abs(out[3]["f1"] - 2 * 1 / (3 + 1)) < 1e-12
    assert out[4]["f1"] == 1.0 and out[4]["exact_match"] is True
    assert out[5]["f1"] == 0.0 and out[5]["n_common_tokens"] == 0
    s = eval_summary(eval_scores(_rows(spark, rows))).first()
    assert s["n_examples"] == 5
    assert s["em_pct_e4"] == 4000  # 2 of 5


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="ab c.!", max_size=30),
            st.text(alphabet="ab c.!", max_size=30),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_matches_python_reference(spark, pairs):
    rows = [(i, p, r) for i, (p, r) in enumerate(pairs)]
    out = {r["example_id"]: r for r in eval_scores(_rows(spark, rows)).collect()}
    for i, (p, r) in enumerate(pairs):
        assert abs(out[i]["f1"] - py_f1(p, r)) < 1e-12, (p, r)
