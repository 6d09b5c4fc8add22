"""Padding-aware inference batching (functions/batching.py) and the
media -> ANN embedding bridge (multimodal.embed_media)."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.batching import batch_plan_stats, inference_batch_plan


def _docs(spark, lengths):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
        "doc_id bigint, text string",
    )


def test_every_batch_fits_budget(spark):
    lengths = [1, 3, 7, 8, 9, 15, 16, 17, 31, 40, 64, 100, 200, 500] * 5
    plan = inference_batch_plan(_docs(spark, lengths), max_tokens_per_batch=256)
    stats = batch_plan_stats(plan).collect()
    assert stats
    for b in stats:
        # padded cost within budget, except one-row batches of
        # over-budget docs (reported, never dropped)
        assert b["padded_tokens"] <= 256 or b["n_rows"] == 1
    # every doc planned exactly once
    assert plan.count() == len(lengths)
    assert plan.select("doc_id").distinct().count() == len(lengths)


def test_band_is_next_pow2_and_batch_homogeneous(spark):
    plan = inference_batch_plan(
        _docs(spark, [1, 2, 3, 4, 5, 8, 9, 16, 17]), max_tokens_per_batch=64
    ).collect()
    for r in plan:
        band = r["band_tokens"]
        assert band >= max(r["n_tokens"], 1)
        assert band & (band - 1) == 0  # power of two
        assert band < 2 * max(r["n_tokens"], 1) + 1  # next pow2, not higher
    # all rows of one batch share a band (padding bounded by band width)
    by_batch = {}
    for r in plan:
        by_batch.setdefault(r["batch_id"], set()).add(r["band_tokens"])
    assert all(len(bands) == 1 for bands in by_batch.values())


def test_deterministic_across_partitionings(spark):
    docs = _docs(spark, list(range(1, 120)))
    a = {
        r["doc_id"]: r["batch_id"]
        for r in inference_batch_plan(docs, 128).collect()
    }
    b = {
        r["doc_id"]: r["batch_id"]
        for r in inference_batch_plan(docs.repartition(7), 128).collect()
    }
    assert a == b


def test_oversize_doc_gets_single_row_batch(spark):
    plan = inference_batch_plan(_docs(spark, [500, 600, 3]), max_tokens_per_batch=10)
    stats = {r["batch_id"]: r for r in batch_plan_stats(plan).collect()}
    big = [s for s in stats.values() if s["band_tokens"] > 10]
    assert all(s["n_rows"] == 1 for s in big)


def test_exact_counts_left_join_contract(spark):
    docs = _docs(spark, [4, 4, 4])
    partial = spark.createDataFrame(
        [(0, 4), (1, 4)], "doc_id bigint, n_bpe_tokens bigint"
    )
    with pytest.raises(Exception, match="no row for doc_id=2"):
        inference_batch_plan(docs, 64, token_counts_df=partial).collect()


def test_validation(spark):
    docs = _docs(spark, [1])
    with pytest.raises(ValueError, match="max_tokens_per_batch"):
        inference_batch_plan(docs, 0)
    with pytest.raises(ValueError, match="n_salts"):
        inference_batch_plan(docs, 10, n_salts=0)


def test_embed_media_feeds_ann_stack(spark, warehouse_dir):
    from pg_auto_dw_spark.functions.multimodal import embed_media, synth_media_df
    from pg_auto_dw_spark.functions.similarity import build_ivf_index, ivf_search_index
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(60)
    media = synth_media_df(docs)
    emb = embed_media(media, dims=32)
    rows = emb.collect()
    assert all(
        r["embedding"] is None or len(r["embedding"]) == 32 for r in rows
    )
    # unit norm for non-null payloads with >= 3 bytes
    import math

    for r in rows:
        if r["embedding"] and any(x != 0 for x in r["embedding"]):
            assert abs(math.sqrt(sum(x * x for x in r["embedding"])) - 1) < 1e-9
    # drops straight into the persisted IVF index, and searching with a
    # known payload's own vector retrieves that media id first
    wh = Warehouse(spark, warehouse_dir)
    build_ivf_index(
        wh, emb.filter(F.col("embedding").isNotNull()), "media",
        stride=10, dims=32, id_col="media_id",
    )
    probe = next(r for r in rows if r["embedding"])
    hits = ivf_search_index(
        wh, "media", [(0, list(probe["embedding"]))], k=3,
        n_probes=2, id_col="media_id",
    ).collect()
    assert hits and hits[0]["neighbor_id"] == probe["media_id"]
    assert hits[0]["cosine"] > 0.999


def test_embed_media_null_payload_is_null(spark):
    from pg_auto_dw_spark.functions.multimodal import embed_media

    media = spark.createDataFrame(
        [(1, "image", None, None), (2, "audio", b"hello world bytes", None)],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    got = {r["media_id"]: r["embedding"] for r in embed_media(media, 16).collect()}
    assert got[1] is None
    assert got[2] is not None and len(got[2]) == 16
