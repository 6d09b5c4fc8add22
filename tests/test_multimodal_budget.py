"""Modality-budgeted token sampling (functions/corpus.py
multimodal_token_budget_sample): the token_budget_sample greedy
bucket-coarse construction where each example's budget cost is text
tokens + linked vision tokens. Pins the text-only degeneracy (empty
links == token_budget_sample byte-exactly), the media bill (per-item
frames x tokens_per_frame, multi-media sums, unlinked docs cost 0),
the per-language budget invariant, the loud missing-cost failure,
and the cost_col banded override."""

import pytest

from pg_auto_dw_spark.functions.corpus import (
    multimodal_token_budget_sample,
    token_budget_sample,
)


def _docs(spark, n=40):
    # repeating english-ish text of growing width so budgets bite
    rows = [(i, ("the quick brown fox " * (1 + i % 7)).strip())
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _links_costs(spark, n=40):
    """Docs with id % 5 != 0 carry one media item (id -> media id*10),
    doc 3 carries a second; frames grow with id so costs vary."""
    links = [(i * 10, i) for i in range(n) if i % 5 != 0]
    links.append((999, 3))
    costs = [(i * 10, 1 + i % 9) for i in range(n)]
    costs.append((999, 50))
    return (
        spark.createDataFrame(links, "media_id bigint, doc_id bigint"),
        spark.createDataFrame(costs, "media_id bigint, n_frames bigint"),
    )


def test_text_only_degenerates_to_token_budget_sample(spark):
    docs = _docs(spark)
    empty = spark.createDataFrame([], "media_id bigint, doc_id bigint")
    costs = spark.createDataFrame([], "media_id bigint, n_frames bigint")
    mm = multimodal_token_budget_sample(
        docs, empty, costs, budget_tokens=300
    ).collect()
    base = token_budget_sample(docs, budget_tokens=300).collect()
    assert {r["doc_id"] for r in mm} == {r["doc_id"] for r in base}
    assert all(r["n_media_tokens"] == 0 for r in mm)
    mm_tok = {r["doc_id"]: r["n_tokens"] for r in mm}
    assert all(mm_tok[r["doc_id"]] == r["n_bpe_tokens"] for r in base)


def test_media_bill_and_budget_invariant(spark):
    docs = _docs(spark)
    links, costs = _links_costs(spark)
    out = multimodal_token_budget_sample(
        docs, links, costs, budget_tokens=2_000, tokens_per_frame=16
    ).collect()
    assert out
    for r in out:
        assert r["n_tokens"] == r["n_text_tokens"] + r["n_media_tokens"]
        if r["doc_id"] % 5 == 0 and r["doc_id"] != 3:
            assert r["n_media_tokens"] == 0
        elif r["doc_id"] == 3:
            # own media (frames 1+3%9=4) plus the extra 50-frame item
            assert r["n_media_tokens"] == (4 + 50) * 16
        else:
            assert r["n_media_tokens"] == (1 + r["doc_id"] % 9) * 16
    # kept examples never exceed the per-language budget
    by_lang = {}
    for r in out:
        by_lang[r["detected_lang"]] = by_lang.get(r["detected_lang"], 0) + r["n_tokens"]
    assert all(v <= 2_000 for v in by_lang.values()), by_lang


def test_media_cost_displaces_text(spark):
    """The same corpus under the same budget keeps FEWER examples once
    media costs bill against it -- vision tokens displace text."""
    docs = _docs(spark)
    links, costs = _links_costs(spark)
    with_media = multimodal_token_budget_sample(
        docs, links, costs, budget_tokens=1_000, tokens_per_frame=64
    ).count()
    empty = spark.createDataFrame([], "media_id bigint, doc_id bigint")
    text_only = multimodal_token_budget_sample(
        docs, empty, costs, budget_tokens=1_000
    ).count()
    assert with_media < text_only


def test_missing_cost_row_fails_loudly(spark):
    docs = _docs(spark, n=6)
    links = spark.createDataFrame(
        [(77, 1)], "media_id bigint, doc_id bigint"
    )
    costs = spark.createDataFrame([], "media_id bigint, n_frames bigint")
    # the raise_error surfaces at the example-frame checkpoint as the
    # converted SparkRuntimeException (sibling pack_multimodal test
    # convention: match on the message, not the wrapper type)
    with pytest.raises(Exception, match="media_id=77"):
        multimodal_token_budget_sample(docs, links, costs).collect()


def test_cost_col_banded_override(spark):
    docs = _docs(spark, n=10)
    links = spark.createDataFrame(
        [(10, 1)], "media_id bigint, doc_id bigint"
    )
    costs = spark.createDataFrame(
        [(10, 3, 777)], "media_id bigint, n_frames bigint, banded bigint"
    )
    out = {
        r["doc_id"]: r
        for r in multimodal_token_budget_sample(
            docs, links, costs, budget_tokens=10_000, cost_col="banded"
        ).collect()
    }
    assert out[1]["n_media_tokens"] == 777  # not n_frames * tpf
