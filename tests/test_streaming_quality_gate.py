"""Streaming quality gate (r11 VERDICT directive 6): the landing zone
composed with Gopher rules + the r11-trained linear classifier --
train -> gate -> ingest -> ledger accounting, the streaming twin of
the r11 batch curation-loop test."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.functions.selection import train_linear_classifier
from pg_auto_dw_spark.streaming.jobs import jsonl_ingest_apply, jsonl_ingest_stream
from pg_auto_dw_spark.warehouse import Warehouse

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

# separable vocabularies: the trained model must score GOOD positive
# and JUNK negative; both pass the (relaxed) Gopher rules so the
# classifier leg is load-bearing
GOOD = ("the quick study found that careful analysis gives better results "
        "and the method works well with clear data")
JUNK = ("zzqx vvkp wwrt qqpl mmnb the of ffgh ddjk ssle hhwo rrty uuie "
        "ppas oolk iijh and ggfd")


def _train(spark):
    pos = spark.createDataFrame(
        [(i, GOOD + f" extra{i % 3}") for i in range(12)], "doc_id bigint, text string"
    )
    neg = spark.createDataFrame(
        [(i, JUNK + f" noise{i % 3}") for i in range(12)], "doc_id bigint, text string"
    )
    weights, losses = train_linear_classifier(pos, neg, iters=6)
    assert losses[-1] < losses[0]
    return weights.localCheckpoint()  # frozen model bytes for the stream


GATE = dict(
    rejected_table="docs.rejected",
    quality_gopher=True,
    gopher_kwargs=dict(min_words=5, min_stopwords=1),
    min_quality_score=0.0,
)


def test_gate_routes_three_ways_end_to_end(spark, tmp_path):
    """clean = typed AND gopher-pass AND model-pass; rejected = typed
    but gate-failing (audit); quarantine = malformed lines. The whole
    batch commits in ONE transaction with the ledger row."""
    weights = _train(spark)
    src = tmp_path / "feed"
    src.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": GOOD}),            # clean
        json.dumps({"doc_id": 2, "text": GOOD + " again"}),  # clean
        json.dumps({"doc_id": 3, "text": "too short"}),      # gopher reject
        json.dumps({"doc_id": 4, "text": JUNK}),             # model reject
        json.dumps({"doc_id": None, "text": JUNK + " xx"}),  # NULL id: still routed by text
        "{broken",                                           # quarantine
    ]
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    kwargs = dict(
        schema=SCHEMA, wh=wh, clean_table="docs.clean",
        quarantine_table="docs.quarantine",
        checkpoint_dir=str(tmp_path / "ckpt"),
        quality_weights=weights, **GATE,
    )
    jsonl_ingest_stream(spark, str(src), **kwargs).awaitTermination(120)
    assert {r["doc_id"] for r in wh.read("docs.clean").collect()} == {1, 2}
    rejected = wh.read("docs.rejected").collect()
    assert {r["doc_id"] for r in rejected} == {3, 4, None}
    assert wh.read("docs.quarantine").count() == 1
    assert wh.read("docs.clean.ingest_log").count() == 1

    # restart: the ledger + checkpoint make the gate exactly-once too
    jsonl_ingest_stream(spark, str(src), **kwargs).awaitTermination(120)
    assert wh.read("docs.clean").count() == 2
    assert wh.read("docs.rejected").count() == 3

    # a late file flows through the same gate incrementally
    (src / "b.jsonl").write_text(
        json.dumps({"doc_id": 9, "text": GOOD + " more"}) + "\n"
        + json.dumps({"doc_id": 10, "text": JUNK + " more"}) + "\n"
    )
    jsonl_ingest_stream(spark, str(src), **kwargs).awaitTermination(120)
    assert {r["doc_id"] for r in wh.read("docs.clean").collect()} == {1, 2, 9}
    assert wh.read("docs.rejected").count() == 4


def test_gate_off_is_bitwise_legacy(spark, tmp_path):
    """No gate kwargs -> identical legacy behavior: two-way split,
    no rejected table, dict without the 'rejected' key."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [('{"doc_id": 1, "text": "one"}',), ("{broken",)], "value string"
    )
    out = jsonl_ingest_apply(
        wh, "d.clean", "d.quar", SCHEMA, batch, 0
    )
    assert out == {"clean": 1, "quarantined": 1, "replay": False}
    assert not wh.exists("d.rejected")


def test_gate_replay_is_idempotent_and_transactional(spark, tmp_path):
    """Re-applying a committed batch id no-ops across ALL THREE routed
    tables; zero-token rows (no score row) fail closed."""
    weights = _train(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [
            (json.dumps({"doc_id": 1, "text": GOOD}),),
            (json.dumps({"doc_id": 2, "text": ""}),),  # zero tokens: fail closed
        ],
        "value string",
    )
    kwargs = dict(quality_weights=weights, **{**GATE, "rejected_table": "d.rejected"})
    out = jsonl_ingest_apply(wh, "d.clean", "d.quar", SCHEMA, batch, 7, **kwargs)
    assert out == {"clean": 1, "quarantined": 0, "rejected": 1, "replay": False}
    replay = jsonl_ingest_apply(wh, "d.clean", "d.quar", SCHEMA, batch, 7, **kwargs)
    assert replay["replay"] and replay["clean"] == 0 and replay["rejected"] == 0
    assert wh.read("d.clean").count() == 1
    assert wh.read("d.rejected").count() == 1


def test_trained_model_separates_streams(spark):
    """The composition's load-bearing claim: the r11 trainer's weights,
    served through the gate's scorer, rank every GOOD doc above every
    JUNK doc (separation, not just loss descent)."""
    from pg_auto_dw_spark.functions.selection import hashed_linear_score

    weights = _train(spark)
    docs = spark.createDataFrame(
        [(i, GOOD + f" v{i}") for i in range(5)]
        + [(100 + i, JUNK + f" v{i}") for i in range(5)],
        "doc_id bigint, text string",
    )
    scores = {r["doc_id"]: r["score"] for r in
              hashed_linear_score(docs, weights=weights).collect()}
    good = [s for d, s in scores.items() if d < 100]
    junk = [s for d, s in scores.items() if d >= 100]
    assert min(good) > 0.0 > max(junk)
