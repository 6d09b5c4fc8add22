"""Streaming SEMANTIC decontaminating landing zone (r12): the
paraphrase-grade twin of the Bloom zone -- arriving JSONL rows embed
under the persisted chunk index's frozen geometry and route three
ways (clean / contaminated / quarantine) in one transaction."""

import json

from pyspark.sql import types as T

from pg_auto_dw_spark.functions.semsearch import build_chunk_search_index
from pg_auto_dw_spark.streaming.jobs import (
    jsonl_semdecon_ingest_apply,
    jsonl_semdecon_ingest_stream,
)
from pg_auto_dw_spark.warehouse import Warehouse
from tests.test_semsearch import _docs

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

# near-verbatim lift of corpus doc 2 (word edits break every exact
# gram; the embedding still clears the threshold)
PARAPHRASE = "stock markets  rallied today, as investors cheered earnings reports!"
UNRELATED = ("volcanic eruptions reshaped the remote island landscape "
             "over centuries of activity")


def _index(spark, tmp_path):
    iwh = Warehouse(spark, str(tmp_path / "ix"))
    build_chunk_search_index(
        iwh, _docs(spark), "dc", chunk_words=8, stride=6, dims=32,
        kmeans_stride=3,
    )
    return iwh


def test_stream_routes_three_ways(spark, tmp_path):
    iwh = _index(spark, tmp_path)
    src = tmp_path / "feed"
    src.mkdir()
    (src / "a.jsonl").write_text(
        json.dumps({"doc_id": 100, "text": PARAPHRASE}) + "\n"
        + json.dumps({"doc_id": 101, "text": UNRELATED}) + "\n"
        + json.dumps({"doc_id": None, "text": PARAPHRASE + " twice"}) + "\n"
        + "{broken\n"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    kwargs = dict(
        schema=SCHEMA, wh=wh, clean_table="d.clean",
        contaminated_table="d.contam", quarantine_table="d.quar",
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_wh=iwh, index_name="dc", threshold=0.8, n_probes=4,
    )
    jsonl_semdecon_ingest_stream(spark, str(src), **kwargs).awaitTermination(120)
    clean = {r["doc_id"] for r in wh.read("d.clean").collect()}
    contam = {r["doc_id"] for r in wh.read("d.contam").collect()}
    assert clean == {101}
    # the NULL-id paraphrase routes by its OWN text (row-key routing)
    assert contam == {100, None}
    assert wh.read("d.quar").count() == 1
    assert wh.read("d.clean.ingest_log").count() == 1

    # restart over the same directory: the ledger + checkpoint no-op
    jsonl_semdecon_ingest_stream(spark, str(src), **kwargs).awaitTermination(120)
    assert wh.read("d.clean").count() == 1
    assert wh.read("d.contam").count() == 2

    # a late file flows through the same frozen-geometry gate
    (src / "b.jsonl").write_text(
        json.dumps({"doc_id": 200, "text": UNRELATED + " again"}) + "\n"
    )
    jsonl_semdecon_ingest_stream(spark, str(src), **kwargs).awaitTermination(120)
    assert {r["doc_id"] for r in wh.read("d.clean").collect()} == {101, 200}


def test_apply_replay_and_empty_text(spark, tmp_path):
    """Replaying a committed batch id no-ops all three tables; a
    zero-token row embeds to nothing and is CLEAN (absence of
    contamination evidence passes -- the Bloom-zone convention, the
    opposite polarity of the quality gate's fail-closed)."""
    iwh = _index(spark, tmp_path)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [
            (json.dumps({"doc_id": 1, "text": PARAPHRASE}),),
            (json.dumps({"doc_id": 2, "text": ""}),),
        ],
        "value string",
    )
    args = (wh, "d.clean", "d.contam", "d.quar", SCHEMA, iwh, "dc")
    out = jsonl_semdecon_ingest_apply(*args, batch, 5, threshold=0.8)
    assert out == {"clean": 1, "contaminated": 1, "quarantined": 0,
                   "replay": False}
    assert {r["doc_id"] for r in wh.read("d.clean").collect()} == {2}
    replay = jsonl_semdecon_ingest_apply(*args, batch, 5, threshold=0.8)
    assert replay["replay"] and replay["clean"] == 0
    assert wh.read("d.clean").count() == 1 and wh.read("d.contam").count() == 1
    # an all-malformed batch drives the embed/probe path with an EMPTY
    # typed frame: everything quarantines, nothing throws
    bad = spark.createDataFrame([("{broken",), ("also bad",)], "value string")
    out2 = jsonl_semdecon_ingest_apply(*args, bad, 6, threshold=0.8)
    assert out2 == {"clean": 0, "contaminated": 0, "quarantined": 2,
                    "replay": False}
