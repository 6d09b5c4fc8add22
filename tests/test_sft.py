"""SFT conversation assembly (functions/sft.py): rendered text +
loss-mask spans must agree exactly (spans sliced out of the text
reproduce the contents)."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.sft import render_chat, trainable_char_stats

TURNS = [
    (1, 0, "user", "hello there"),
    (1, 1, "assistant", "hi! how can I help?"),
    (1, 2, "user", "what is spark"),
    (1, 3, "assistant", "a distributed engine"),
    (2, 0, "system", "be terse"),
    (2, 1, "user", "ok"),
    (2, 2, "assistant", None),  # NULL content: zero-width span
]


def _turns(spark):
    return spark.createDataFrame(
        TURNS, "conv_id bigint, turn_idx bigint, role string, content string"
    )


def test_render_and_spans_agree(spark):
    out = {r["conv_id"]: r for r in render_chat(_turns(spark)).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1["n_turns"] == 4 and r1["n_chars"] == len(r1["text"])
    # exact rendering under the pinned template
    assert r1["text"].startswith("<|user|>\nhello there\n<|assistant|>\n")
    # every span slices back to its turn's content
    contents = {t[1]: (t[3] or "") for t in TURNS if t[0] == 1}
    for s in r1["spans"]:
        assert r1["text"][s["start"]:s["end"]] == contents[s["turn_idx"]]
        assert s["trainable"] == (s["role"] == "assistant")
    # NULL content: zero-width but present
    s2 = {s["turn_idx"]: s for s in out[2]["spans"]}
    assert s2[2]["start"] == s2[2]["end"]
    assert out[2]["spans"][0]["role"] == "system"


def test_turn_order_is_idx_not_input_order(spark):
    shuffled = spark.createDataFrame(
        [(5, 1, "assistant", "second"), (5, 0, "user", "first")],
        "conv_id bigint, turn_idx bigint, role string, content string",
    )
    r = render_chat(shuffled).first()
    assert r["text"].index("first") < r["text"].index("second")


def test_max_turns_guard(spark):
    many = spark.range(10).select(
        F.lit(1).alias("conv_id"),
        F.col("id").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("x").alias("content"),
    )
    with pytest.raises(Exception, match="max_turns"):
        render_chat(many, max_turns=5).collect()


def test_trainable_char_stats(spark):
    rendered = render_chat(_turns(spark))
    stats = {r["conv_id"]: r for r in trainable_char_stats(rendered).collect()}
    r1 = rendered.filter(F.col("conv_id") == 1).first()
    expect = sum(
        s["end"] - s["start"] for s in r1["spans"] if s["trainable"]
    )
    assert stats[1]["trainable_chars"] == expect
    assert stats[1]["trainable_pct_e4"] == expect * 10000 // r1["n_chars"]
    # conv 2's only assistant turn is NULL content -> zero trainable
    assert stats[2]["trainable_chars"] == 0


def test_rendered_conversations_flow_into_packing(spark):
    """Composition: render_chat output is a documents frame
    (conv_id, text), so the SFT corpus drops straight into the
    pretraining packer -- every rendered conversation gets a placement
    and the token accounting is consistent."""
    from pg_auto_dw_spark.functions.corpus import pack_sequences

    rendered = render_chat(_turns(spark)).withColumnRenamed(
        "conv_id", "doc_id"
    )
    plan = pack_sequences(rendered, seq_tokens=16)
    rows = plan.collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    # global offsets tile the stream: sorted offsets are cumulative
    ordered = sorted(rows, key=lambda r: r["global_offset"])
    acc = 0
    for r in ordered:
        assert r["global_offset"] == acc
        acc += r["n_bpe_tokens"]
