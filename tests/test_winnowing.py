"""Winnowing fingerprints (functions/text.py winnow_fingerprints;
Schleimer, Wilkerson & Aiken, SIGMOD 2003) -- pinned against a pure
Python reference implementation and the paper's detection guarantee."""

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pg_auto_dw_spark.functions.text import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: min of each full window of w k-gram hashes,
    RIGHTMOST position on ties, deduped. Positions 1-based over the
    normalized (lowercase, alnum-only) text."""
    n = re.sub(r"[^a-z0-9]", "", (text or "").lower())
    ng = len(n) - k + 1
    if ng < 1:
        return set()
    hashes = [
        int(hashlib.md5(n[i:i + k].encode()).hexdigest()[:8], 16)
        for i in range(ng)
    ]
    fps = set()
    for s in range(ng - w + 1):
        window = hashes[s:s + w]
        m = min(window)
        pos = s + max(i for i, h in enumerate(window) if h == m)
        fps.add((pos + 1, m))
    return fps


def _spark_fps(spark, rows, k=8, w=4):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = winnow_fingerprints(df, k=k, w=w).collect()
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    return got


def test_matches_python_reference_hand_case(spark):
    text = "The quick brown fox jumps over the lazy dog, repeatedly."
    got = _spark_fps(spark, [(1, text)], k=5, w=3)
    assert got[1] == py_winnow(text, 5, 3)


def test_short_and_null_docs_yield_nothing(spark):
    got = _spark_fps(spark, [(1, "tiny"), (2, None), (3, "")], k=8, w=4)
    assert got == {}


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    text=st.text(alphabet="abcdef ", min_size=0, max_size=120),
    k=st.integers(min_value=2, max_value=6),
    w=st.integers(min_value=1, max_value=5),
)
def test_matches_python_reference_random(spark, text, k, w):
    got = _spark_fps(spark, [(1, text)], k=k, w=w)
    assert got.get(1, set()) == py_winnow(text, k, w)


def test_guarantee_shared_substring_shares_a_fingerprint(spark):
    """The paper's theorem: a common substring of length >= w + k - 1
    (normalized space) forces at least one shared fingerprint."""
    k, w = 8, 4
    common = "zqxjkvbnmplwrtysd"  # len 17 >= w + k - 1 = 11
    a = "aaaa" + common + "bbbbbbbbbbbb"
    b = "cccccccccc" + common + "dddd"
    fps = _spark_fps(spark, [(1, a), (2, b)], k=k, w=w)
    shared = {h for _, h in fps[1]} & {h for _, h in fps[2]}
    assert shared, "guaranteed shared fingerprint missing"


def test_overlap_pairs(spark):
    k, w = 8, 4
    common = "zqxjkvbnmplwrtysdqqwweerr"
    rows = [
        (1, "aaaa" + common + "bbbbbbbb"),
        (2, "cccccccc" + common + "dddd"),
        (3, "totally unrelated text about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(df, k=k, w=w)
    pairs = winnow_overlap_pairs(fps, min_shared=2).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}
    assert pairs[0]["shared_fps"] >= 2
