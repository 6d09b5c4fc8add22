"""Round-10 session operators: DoReMi domain reweighting and the
datacard composition-drift report."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.datacard import datacard_drift
from pg_auto_dw_spark.functions.sampling import doremi_domain_weights


def _losses(spark, rows):
    return spark.createDataFrame(
        rows, "domain string, proxy_loss double, ref_loss double"
    )


def test_doremi_hand_math(spark):
    rows = [("web", 3.0, 2.0), ("code", 2.0, 2.0), ("books", 2.5, 3.0)]
    out = {
        r["domain"]: r
        for r in doremi_domain_weights(_losses(spark, rows), lr=1.0).collect()
    }
    # excess: web 1.0, code 0.0, books 0.0 (clamped)
    assert out["web"]["excess_loss"] == 1.0
    assert out["code"]["excess_loss"] == 0.0
    assert out["books"]["excess_loss"] == 0.0
    z = math.exp(1.0) + 1.0 + 1.0
    assert abs(out["web"]["weight"] - math.exp(1.0) / z) < 1e-12
    assert abs(out["code"]["weight"] - 1.0 / z) < 1e-12
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-12


def test_doremi_smoothing_one_is_uniform(spark):
    rows = [("a", 9.0, 1.0), ("b", 1.0, 1.0), ("c", 1.0, 1.0), ("d", 1.0, 1.0)]
    out = doremi_domain_weights(_losses(spark, rows), smoothing=1.0).collect()
    for r in out:
        assert abs(r["weight"] - 0.25) < 1e-12


def test_doremi_validates_params(spark):
    df = _losses(spark, [("a", 1.0, 1.0)])
    with pytest.raises(ValueError, match="smoothing"):
        doremi_domain_weights(df, smoothing=1.5)
    with pytest.raises(ValueError, match="lr"):
        doremi_domain_weights(df, lr=-1.0)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    losses=st.lists(
        st.tuples(
            st.floats(min_value=0.1, max_value=10.0),
            st.floats(min_value=0.1, max_value=10.0),
        ),
        min_size=2,
        max_size=8,
    ),
    lr=st.floats(min_value=0.0, max_value=3.0),
    smoothing=st.floats(min_value=0.0, max_value=1.0),
)
def test_doremi_invariants(spark, losses, lr, smoothing):
    rows = [(f"d{i}", p, r) for i, (p, r) in enumerate(losses)]
    out = doremi_domain_weights(
        _losses(spark, rows), lr=lr, smoothing=smoothing
    ).collect()
    # weights are a distribution
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-9
    assert all(r["weight"] >= smoothing / len(rows) - 1e-12 for r in out)
    # monotone in excess loss: more headroom never gets LESS weight
    by_excess = sorted(out, key=lambda r: r["excess_loss"])
    for a, b in zip(by_excess, by_excess[1:]):
        assert b["weight"] >= a["weight"] - 1e-12


DOC = (
    "the quick brown fox jumps over the lazy dog and the miller "
    "watches the wheel turn slowly in the afternoon sun every day"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, lang string, text string")


def test_datacard_drift_flags(spark):
    old = _docs(
        spark,
        [(i, "web", "en", f"{DOC} {i}") for i in range(10)]
        + [(100 + i, "books", "en", f"{DOC} b{i}") for i in range(10)],
    )
    new = _docs(
        spark,
        # web doubles (drift), books stable, wiki appears (one-sided)
        [(i, "web", "en", f"{DOC} {i}") for i in range(20)]
        + [(100 + i, "books", "en", f"{DOC} b{i}") for i in range(10)]
        + [(200, "wiki", "en", DOC)],
    )
    out = {
        (r["source"], r["lang"]): r
        for r in datacard_drift(old, new, rel_threshold=0.5).collect()
    }
    assert out[("web", "en")]["drifted"] is True
    assert out[("web", "en")]["n_docs_delta"] == 10
    assert out[("books", "en")]["drifted"] is False
    assert out[("books", "en")]["n_docs_delta"] == 0
    assert out[("wiki", "en")]["drifted"] is True  # one-sided group
    assert out[("wiki", "en")]["n_docs_old"] is None
