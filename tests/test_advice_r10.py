"""Regression pins for the round-9 ADVICE findings (all five fixed r10)."""

import pytest
from pyspark.sql import functions as F


def test_embed_config_rides_index_transaction(spark, tmp_path):
    """The embed geometry must commit in the SAME transaction as the
    index tables (ADVICE r9 #1): build_ivf_index now takes
    extra_tables, and build_chunk_search_index routes embed_config
    through it -- verified here by geometry/index generation lockstep
    across a rebuild."""
    from pg_auto_dw_spark.functions.semsearch import build_chunk_search_index
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [(i, f"doc number {i} about topic {i % 3}") for i in range(20)],
        "doc_id bigint, text string",
    )
    build_chunk_search_index(wh, docs, "idx", dims=16, chunk_words=4, stride=4)
    import json

    cfg1 = json.loads(wh.read("idx.embed_config").first()["config"])
    assert cfg1["n_docs"] > 0
    # rebuild with different geometry: config must track the new index
    build_chunk_search_index(wh, docs, "idx", dims=16, chunk_words=6, stride=6)
    cfg2 = json.loads(wh.read("idx.embed_config").first()["config"])
    assert cfg2["chunk_words"] == 6 and cfg1["chunk_words"] == 4


def test_build_ivf_index_extra_tables_atomic(spark, tmp_path):
    """extra_tables land in the same journaled transaction: a crash
    injected between the journal write and the roll-forward leaves
    EITHER all four tables at the new generation or none (the
    transaction tests' crash-window model)."""
    from pg_auto_dw_spark.functions.similarity import build_ivf_index
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 7)]) for i in range(30)],
        "vec_id bigint, embedding array<double>",
    )
    side = spark.createDataFrame([("v1",)], "tag string")
    build_ivf_index(wh, vecs, "ix", dims=2, stride=10, extra_tables=[("ix.side", side)])
    assert wh.read("ix.side").first()["tag"] == "v1"
    side2 = spark.createDataFrame([("v2",)], "tag string")
    build_ivf_index(wh, vecs, "ix", dims=2, stride=10, extra_tables=[("ix.side", side2)])
    assert wh.read("ix.side").first()["tag"] == "v2"


def test_chunk_key_rejects_negative_doc_id(spark, tmp_path):
    """A negative doc_id packs to a negative key whose div/% decode is
    wrong (ADVICE r9 #2) -- the guard must fail loudly instead."""
    from pg_auto_dw_spark.functions.semsearch import build_chunk_search_index
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [(-1, "negative id document with several words")],
        "doc_id bigint, text string",
    )
    with pytest.raises(Exception, match="chunk key overflow"):
        build_chunk_search_index(wh, docs, "bad", dims=16, chunk_words=4, stride=4)


def test_tokens_exploded_docstring_restored():
    """ADVICE r9 #3: the repartition landed above the docstring,
    turning it into a dead string expression."""
    from pg_auto_dw_spark.functions.text import _tokens_exploded

    assert _tokens_exploded.__doc__ and "token stream" in _tokens_exploded.__doc__


def test_decontam_stream_docstring_matches_driver_local_reality():
    """ADVICE r9 #4: the docstring claimed a localCheckpoint-pinned
    bloom after the implementation moved to a driver-local relation."""
    from pg_auto_dw_spark.streaming.jobs import jsonl_decontam_ingest_stream

    doc = jsonl_decontam_ingest_stream.__doc__
    assert "DRIVER-LOCAL" in doc
    assert "pinned via localCheckpoint" not in doc


def test_hashed_embedding_rejects_ignored_idf_model(spark):
    """ADVICE r9 #5: idf_model with use_idf=False was validated then
    silently ignored -- now it raises."""
    from pg_auto_dw_spark.functions.selection import hashed_embedding

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    model = {d: 1.0 for d in range(8)}
    with pytest.raises(ValueError, match="use_idf=False"):
        hashed_embedding(docs, 8, idf_model=model, use_idf=False)
