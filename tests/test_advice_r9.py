"""Regression pins for the round-8 ADVICE findings (all five fixed r9)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.functions.corpus import pack_sequences
from pg_auto_dw_spark.functions.sketch import equi_width_histogram
from pg_auto_dw_spark.functions.tokenizer import bpe_apply


def test_histogram_rejects_degenerate_geometry(spark):
    df = spark.createDataFrame([(1, 1.0)], "g int, v double")
    with pytest.raises(ValueError, match="hi > lo"):
        equi_width_histogram(df, ["g"], "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError, match="hi > lo"):
        equi_width_histogram(df, ["g"], "v", 5.0, 1.0, 10)
    with pytest.raises(ValueError, match="n_buckets"):
        equi_width_histogram(df, ["g"], "v", 0.0, 1.0, 0)


def test_histogram_excludes_nan_like_null(spark):
    # NaN is not removed by isNotNull; it must not clamp into the top
    # bucket (it would silently skew every PSI verdict downstream)
    df = spark.createDataFrame(
        [(1, 0.5), (1, float("nan")), (1, None), (1, 9.5)],
        "g int, v double",
    )
    rows = {
        r["bucket"]: r["cnt"]
        for r in equi_width_histogram(df, ["g"], "v", 0.0, 10.0, 10).collect()
    }
    assert rows == {0: 1, 9: 1}  # only the two real values counted


def test_pack_sequences_fails_on_partial_counts_frame(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f")], "doc_id bigint, text string"
    )
    partial = spark.createDataFrame(
        [(1, 3), (2, 2)], "doc_id bigint, n_bpe_tokens bigint"
    )  # doc 3 missing: must FAIL, not silently truncate the corpus
    with pytest.raises(Exception, match="no row for doc_id=3"):
        pack_sequences(docs, seq_tokens=4, token_counts_df=partial).collect()
    # a complete frame still works
    full = spark.createDataFrame(
        [(1, 3), (2, 2), (3, 1)], "doc_id bigint, n_bpe_tokens bigint"
    )
    out = pack_sequences(docs, seq_tokens=4, token_counts_df=full)
    assert out.count() == 3


def test_bpe_apply_string_doc_ids(spark):
    docs = spark.createDataFrame(
        [("a-1", "the cat"), ("b-2", "an ant")], "doc_id string, text string"
    )
    out = bpe_apply(docs, [("t", "h"), ("a", "n")])
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in out.collect()}
    # "the": t,h,e,</w> -> th,e,</w> = 3 ; "cat": 4
    # "an": an,</w> = 2 ; "ant": an,t,</w> = 3
    assert got == {"a-1": 7, "b-2": 5}


def test_rebalance_requires_geometry_without_build_config(spark, warehouse_dir):
    from pg_auto_dw_spark.functions.similarity import (
        build_ivf_index,
        maybe_rebalance_ivf_index,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, warehouse_dir)
    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    build_ivf_index(wh, vecs, "idx", stride=20, dims=2)
    # simulate a pre-build_config index: drop the config table
    if wh.exists("idx.build_config"):
        wh.drop_table("idx.build_config")
    with pytest.raises(ValueError, match="full\\s+geometry"):
        maybe_rebalance_ivf_index(wh, vecs, "idx", imbalance_threshold=0.0)
    # restating the full geometry explicitly is the sanctioned escape
    res = maybe_rebalance_ivf_index(
        wh, vecs, "idx", imbalance_threshold=0.0,
        stride=20, dims=2, id_col="vec_id", vec_col="embedding",
    )
    assert res["action"] in ("rebuilt", "noop")


def test_decontam_stream_survives_lost_bloom_block(spark, tmp_path):
    """The sink must rebuild the (deterministic) bloom and retry the
    batch when the pinned row is unusable, instead of failing every
    subsequent batch until the caller re-invokes the function."""
    import pg_auto_dw_spark.streaming.jobs as jobs
    from pg_auto_dw_spark.warehouse import Warehouse

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "clean words only here"}\n'
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bench = spark.createDataFrame(
        [(900, "benchmark question eight grams long exactly matching span here")],
        "doc_id bigint, text string",
    )
    # break the FIRST apply only: the sink's recovery path must rebuild
    # and the retried apply must land the batch exactly once
    real_apply = jobs.jsonl_decontam_ingest_apply
    calls = {"n": 0}

    def flaky_apply(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("block of rdd not found (simulated executor loss)")
        return real_apply(*a, **kw)

    jobs.jsonl_decontam_ingest_apply = flaky_apply
    try:
        q = jobs.jsonl_decontam_ingest_stream(
            spark, str(src), schema, wh, "lz.clean", "lz.contam", "lz.quarantine",
            str(tmp_path / "ckpt"), bench, n=4,
        )
        q.awaitTermination(120)
    finally:
        jobs.jsonl_decontam_ingest_apply = real_apply
    assert calls["n"] == 2  # failed once, retried once
    assert wh.read("lz.clean").count() == 1
