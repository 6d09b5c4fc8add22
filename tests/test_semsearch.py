"""Text-in, neighbors-out semantic search (functions/semsearch.py)."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.semsearch import (
    CHUNK_SHIFT,
    build_chunk_search_index,
    embed_text,
    search_chunks,
)
from pg_auto_dw_spark.warehouse import Warehouse

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "stock markets rallied today as investors cheered earnings reports"),
    (3, "the fox and the hound ran through the forest near the river"),
    (4, "central banks raised interest rates to combat inflation pressure"),
    (5, "a lazy dog slept by the river bank while the fox watched quietly"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_embed_text_parity_with_distributed_transform(spark):
    """The driver-side query embedder must land in the SAME space as
    the distributed chunk embedder -- same hashes, same IDF, same
    normalization."""
    from pg_auto_dw_spark.functions.selection import (
        hashed_embedding,
        hashed_idf_model,
    )
    from pg_auto_dw_spark.functions.semsearch import _filled_model

    docs = _docs(spark)
    idf, n_docs = hashed_idf_model(docs, dims=32, with_n_docs=True)
    model = _filled_model(idf, n_docs, 32)
    dist = {
        r["doc_id"]: r["embedding"]
        for r in hashed_embedding(docs, dims=32, idf_model=model).collect()
    }
    for doc_id, text in DOCS:
        local = embed_text(text, idf, n_docs, 32)
        assert max(
            abs(a - b) for a, b in zip(local, dist[doc_id])
        ) < 1e-12, f"doc {doc_id} diverges"


def test_build_and_search_roundtrip(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    stats = build_chunk_search_index(
        wh, _docs(spark), "sem", chunk_words=8, stride=6, dims=32,
        kmeans_stride=3,
    )
    assert stats["vectors"] == stats["chunks"] > 5
    # a verbatim phrase from doc 2 must retrieve doc 2's chunk first
    hits = search_chunks(
        wh, "sem", "stock markets rallied today as investors cheered", k=3,
        n_probes=2,
    ).collect()
    assert hits and hits[0]["doc_id"] == 2
    assert hits[0]["cosine"] > 0.8
    # key decode stays in range
    for h in hits:
        assert 0 <= h["chunk_id"] < CHUNK_SHIFT


def test_search_requires_embed_config(spark, warehouse_dir):
    from pg_auto_dw_spark.functions.selection import hashed_embedding
    from pg_auto_dw_spark.functions.similarity import build_ivf_index

    wh = Warehouse(spark, warehouse_dir)
    emb = hashed_embedding(_docs(spark), dims=16).withColumnRenamed(
        "doc_id", "chunk_key"
    )
    build_ivf_index(wh, emb, "bare", stride=3, dims=16, id_col="chunk_key")
    with pytest.raises(ValueError, match="embed_config"):
        search_chunks(wh, "bare", "anything")


def test_chunk_key_overflow_guard(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    bad = spark.createDataFrame(
        [(1 << 50, "some text here")], "doc_id bigint, text string"
    )
    with pytest.raises(Exception, match="chunk key overflow"):
        build_chunk_search_index(wh, bad, "ovf", chunk_words=4, stride=4, dims=8)


def test_idf_model_must_cover_all_dims(spark):
    from pg_auto_dw_spark.functions.selection import hashed_embedding

    with pytest.raises(ValueError, match="every dim"):
        hashed_embedding(_docs(spark), dims=16, idf_model={0: 1.0})


def test_search_chunks_many_batched_queries(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    build_chunk_search_index(
        wh, _docs(spark), "semb", chunk_words=8, stride=6, dims=32,
        kmeans_stride=3,
    )
    from pg_auto_dw_spark.functions.semsearch import search_chunks_many

    hits = search_chunks_many(
        wh, "semb",
        {7: "stock markets rallied today as investors cheered",
         9: "central banks raised interest rates"},
        k=2, n_probes=2,
    ).collect()
    by_q = {}
    for h in hits:
        by_q.setdefault(h["query_id"], []).append(h)
    assert set(by_q) == {7, 9}
    assert by_q[7][0]["doc_id"] == 2   # verbatim source doc wins
    assert by_q[9][0]["doc_id"] == 4


def test_retrieval_recall_floor(spark, warehouse_dir):
    """r9 VERDICT directive 3: the composed chunk->embed->IVF path must
    actually FIND the right chunks, not just embed consistently. On a
    topic-structured corpus, macro recall@5 at n_probes=2 vs brute
    force (the same index probed at every cell -- exact within probed
    cells, so all-cells IS brute force) must clear 0.9."""
    from pg_auto_dw_spark.functions.semsearch import search_chunks_many
    from pg_auto_dw_spark.functions.similarity import ann_recall_summary

    topics = {
        0: "fox dog river bank forest hound quietly jumps lazy brown",
        1: "stocks markets earnings investors rates inflation banks rally",
        2: "spark shuffle partition executor broadcast catalyst codegen plan",
    }
    rows = []
    for i in range(60):
        words = topics[i % 3].split()
        # deterministic per-doc shuffle-free variation: rotate + repeat
        body = " ".join(words[i % len(words):] + words[: i % len(words)]) * 3
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    wh = Warehouse(spark, warehouse_dir)
    stats = build_chunk_search_index(
        wh, docs, "rf", chunk_words=10, stride=8, dims=32, kmeans_stride=30,
        kmeans_iters=2,
    )
    queries = {i: topics[i % 3] for i in range(0, 60, 7)}

    def hits(n_probes):
        out = search_chunks_many(wh, "rf", queries, k=5, n_probes=n_probes)
        return out.select(
            "query_id",
            (F.col("doc_id") * CHUNK_SHIFT + F.col("chunk_id")).alias("neighbor_id"),
        )

    exact = hits(int(stats["cells"]))
    s = ann_recall_summary(hits(2), exact).first()
    assert s["macro_recall"] >= 0.9, s


def test_ingest_chunks_grows_index_in_same_space(spark, warehouse_dir):
    """New docs ingested under the PERSISTED geometry must be findable
    by text search exactly like built docs, replays must no-op, and
    the embed space must be identical (a verbatim-phrase query ranks
    the new doc's chunk first)."""
    from pg_auto_dw_spark.functions.semsearch import ingest_chunks

    wh = Warehouse(spark, warehouse_dir)
    build_chunk_search_index(
        wh, _docs(spark), "inc", chunk_words=8, stride=6, dims=32,
        kmeans_stride=3,
    )
    before = wh.read("inc.assignment").count()
    new = spark.createDataFrame(
        [(100, "astronomers observed a distant comet passing near jupiter last night")],
        "doc_id bigint, text string",
    )
    n = ingest_chunks(wh, new, "inc")
    assert n >= 1
    assert wh.read("inc.assignment").count() == before + n
    # replay: idempotent, nothing appended twice
    assert ingest_chunks(wh, new, "inc") == 0
    hits = search_chunks(
        wh, "inc", "astronomers observed a distant comet", k=3, n_probes=3
    ).collect()
    assert hits and hits[0]["doc_id"] == 100


def test_semantic_decontaminate_catches_paraphrase(spark, warehouse_dir):
    """A near-verbatim paraphrase of a training doc must flag against
    the persisted index even though whitespace/wording edits break the
    exact gram family; unrelated eval questions must not flag."""
    from pg_auto_dw_spark.functions.semsearch import semantic_decontaminate

    wh = Warehouse(spark, warehouse_dir)
    docs = _docs(spark)
    build_chunk_search_index(
        wh, docs, "dc", chunk_words=8, stride=6, dims=32, kmeans_stride=3,
    )
    evals = spark.createDataFrame(
        [
            # near-verbatim lift of doc 2 with small edits
            (100, "stock markets  rallied today, as investors cheered "
                  "earnings reports!"),
            # unrelated content sharing only stopword-grade vocabulary
            (101, "volcanic eruptions reshaped the remote island "
                  "landscape over centuries of activity"),
        ],
        "eval_id bigint, text string",
    )
    flagged = semantic_decontaminate(
        wh, "dc", evals, threshold=0.8, n_probes=4
    ).collect()
    assert any(r["eval_id"] == 100 and r["doc_id"] == 2 for r in flagged)
    assert not any(r["eval_id"] == 101 for r in flagged)
    # the flagged pair is paraphrase-grade: well above topical noise
    top = max(r["cosine"] for r in flagged if r["eval_id"] == 100)
    assert top >= 0.8


def test_semantic_decontaminate_respects_index_text_col(spark, warehouse_dir):
    """Eval frames with a different text column name work via the
    text_col override; the geometry still comes from the index."""
    from pg_auto_dw_spark.functions.semsearch import semantic_decontaminate

    wh = Warehouse(spark, warehouse_dir)
    build_chunk_search_index(
        wh, _docs(spark), "dc2", chunk_words=8, stride=6, dims=32,
        kmeans_stride=3,
    )
    evals = spark.createDataFrame(
        [(7, "central banks raised interest rates to combat inflation")],
        "eval_id bigint, question string",
    )
    flagged = semantic_decontaminate(
        wh, "dc2", evals, threshold=0.8, n_probes=4, text_col="question"
    ).collect()
    assert any(r["doc_id"] == 4 for r in flagged)
