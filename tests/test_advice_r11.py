"""Regression pins for the round-10 ADVICE findings (all four fixed r11)."""

import pytest
from pyspark.sql import functions as F


def test_null_prediction_scores_zero_not_skipped(spark):
    """ADVICE r10 #1: a NULL prediction must score 0 against a
    non-empty reference (SQuAD convention for a missing generation),
    not produce NULL EM/f1 that eval_summary's avg silently skips --
    previously 2 NULL rows out of 3 yielded a PERFECT macro score."""
    from pg_auto_dw_spark.functions.evalscore import eval_scores, eval_summary

    rows = spark.createDataFrame(
        [
            (1, "paris", "paris"),
            (2, None, "london calling"),
            (3, None, "berlin"),
        ],
        "example_id bigint, prediction string, reference string",
    )
    scores = {r["example_id"]: r for r in eval_scores(rows).collect()}
    assert scores[2]["exact_match"] is False and scores[2]["f1"] == 0.0
    assert scores[3]["exact_match"] is False and scores[3]["f1"] == 0.0
    assert scores[2]["pred_missing"] and not scores[1]["pred_missing"]
    summary = eval_summary(eval_scores(rows)).first()
    assert summary["n_examples"] == 3
    assert summary["n_null_predictions"] == 2
    # 1 perfect + 2 zeros -> 1/3, not 1.0
    assert summary["em_pct_e4"] == 3333
    assert summary["macro_f1_e4"] == 3333


def test_null_reference_scores_zero(spark):
    """NULL reference coalesces to empty too: a non-empty prediction
    against it scores 0, and NULL-vs-NULL scores like empty-vs-empty
    (EM true, f1 1.0) per the documented empty semantics."""
    from pg_auto_dw_spark.functions.evalscore import eval_scores

    rows = spark.createDataFrame(
        [(1, "something", None), (2, None, None)],
        "example_id bigint, prediction string, reference string",
    )
    got = {r["example_id"]: r for r in eval_scores(rows).collect()}
    assert got[1]["exact_match"] is False and got[1]["f1"] == 0.0
    assert got[2]["exact_match"] is True and got[2]["f1"] == 1.0


def test_render_chat_null_role_fails_loudly(spark):
    """ADVICE r10 #2: a NULL role must raise (like the max_turns
    guard), not silently drop the turn's text while nulling every
    subsequent span's offsets."""
    from pg_auto_dw_spark.functions.sft import render_chat

    turns = spark.createDataFrame(
        [
            (7, 0, "user", "hi"),
            (7, 1, None, "dropped silently before r11"),
            (7, 2, "assistant", "hello"),
        ],
        "conv_id bigint, turn_idx bigint, role string, content string",
    )
    with pytest.raises(Exception, match="NULL role in conversation 7"):
        render_chat(turns).collect()


def test_render_chat_null_content_still_fine(spark):
    """The null-ROLE guard must not disturb the documented NULL
    CONTENT behavior (renders empty, keeps a zero-width span)."""
    from pg_auto_dw_spark.functions.sft import render_chat

    turns = spark.createDataFrame(
        [(1, 0, "user", None), (1, 1, "assistant", "ok")],
        "conv_id bigint, turn_idx bigint, role string, content string",
    )
    row = render_chat(turns).first()
    spans = {s["turn_idx"]: s for s in row["spans"]}
    assert spans[0]["start"] == spans[0]["end"]
    assert row["text"][spans[1]["start"]:spans[1]["end"]] == "ok"


def test_margin_guard_disabled_for_nonpositive_positive(spark):
    """ADVICE r10 #3: with the query's best positive cosine <= 0, the
    multiplicative margin inverts (margin * pos > pos) and used to
    drop the HARDEST negatives; now a non-positive reference score
    keeps all negatives."""
    from pg_auto_dw_spark.functions.retrieval import mine_hard_negatives

    hits = spark.createDataFrame(
        [
            # query 1: its positive scored NEGATIVE cosine; the two
            # negatives score higher -- both must survive
            (1, 100, -0.2),
            (1, 200, 0.5),
            (1, 300, 0.1),
            # query 2: normal regime -- margin still applies
            (2, 101, 0.8),
            (2, 201, 0.79),
            (2, 301, 0.2),
        ],
        "query_id bigint, neighbor_id bigint, cosine double",
    )
    positives = spark.createDataFrame(
        [(1, 100), (2, 101)], "query_id bigint, positive_id bigint"
    )
    out = mine_hard_negatives(hits, positives, margin=0.95)
    got = {(r["query_id"], r["negative_id"]) for r in out.collect()}
    assert (1, 200) in got and (1, 300) in got
    # query 2: 0.79 >= 0.95 * 0.8 is false -> kept; sanity that the
    # margin path still drops a probable unlabeled positive at 0.79
    # against margin 0.9 (0.79 >= 0.72 -> dropped)
    tight = mine_hard_negatives(hits, positives, margin=0.9)
    got_tight = {(r["query_id"], r["negative_id"]) for r in tight.collect()}
    assert (2, 201) not in got_tight and (2, 301) in got_tight
    assert (1, 200) in got_tight  # non-positive regime unaffected


def test_ingest_chunks_uses_persisted_text_col(spark, tmp_path):
    """ADVICE r10 #4: an index built over a non-default text column
    must grow from that SAME column -- the column name is persisted in
    embed_config and read back by ingest_chunks."""
    from pg_auto_dw_spark.functions.semsearch import (
        build_chunk_search_index,
        ingest_chunks,
        search_chunks_many,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta topic {i % 3} word {i}") for i in range(12)],
        "doc_id bigint, body string",
    )
    build_chunk_search_index(
        wh, docs, "idx", dims=16, chunk_words=4, stride=4, text_col="body"
    )
    import json

    cfg = json.loads(wh.read("idx.embed_config").first()["config"])
    assert cfg["text_col"] == "body"
    more = spark.createDataFrame(
        [(100, "epsilon zeta eta theta fresh document body")],
        "doc_id bigint, body string",
    )
    appended = ingest_chunks(wh, more, "idx")  # pre-r11: missing-'text' error
    assert appended > 0
    hits = search_chunks_many(
        wh, "idx", {0: "epsilon zeta eta theta"}, k=3, n_probes=4
    ).collect()
    assert any(r["doc_id"] == 100 for r in hits)
