"""Text-in, neighbors-out semantic search: the one-call composition
that turns a raw text corpus into a persisted, queryable chunk-level
vector index using ONLY this package's operators -- no external
embedding model anywhere.

    build_chunk_search_index(wh, docs, "idx")        # once, distributed
    search_chunks(wh, "idx", "query text", k=5)      # per request, cheap

Pipeline at build time: ``text.chunk_documents`` (context-window
chunking, scan-bound) -> ``selection.hashed_idf_model`` (ONE-scan fit,
<= dims+1-row model) -> ``selection.hashed_embedding`` with the model
(ONE-scan transform) -> ``similarity.build_ivf_index`` (k-means
codebook + cell-partitioned assignment, atomic multi-table commit).
The embed geometry (dims, chunking, the full IDF table, n_docs) is
committed to ``<name>.embed_config`` IN THE SAME TRANSACTION as the
index's codebook/assignment/build_config (via build_ivf_index's
extra_tables): a query embedded under different geometry would be
searched in the wrong space silently.

Query time is request-sized by construction: embed the query text
DRIVER-SIDE with ``embed_text`` (pure Python, bit-compatible with the
distributed transform -- same md5 prefixes, same sign bit, same
smoothed IDF), then ``ivf_search_index`` partition-prunes the
assignment table to the probed cells. No corpus scan per query.

Chunk identity: chunk_key = doc_id * 2^20 + chunk_id (decoded back to
(doc_id, chunk_id) in results). The packing is guarded at build time
-- a doc with >= 2^20 chunks, an id >= 2^43, or a NEGATIVE id (which
would decode to the wrong pair under div/% truncation) fails loudly
instead of colliding silently.
"""

from __future__ import annotations

import hashlib
import json
import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SHIFT = 1 << 20  # chunk_id capacity per doc in the packed key

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _default_idf(n_docs: int) -> float:
    return math.log(float(n_docs + 1)) + 1.0


def _filled_model(idf: dict[int, float], n_docs: int, dims: int) -> dict[int, float]:
    d = _default_idf(n_docs)
    return {i: idf.get(i, d) for i in range(dims)}


def embed_text(text: str, idf: dict[int, float], n_docs: int, dims: int) -> list[float]:
    """Driver-side twin of the distributed hashed-TF-IDF transform:
    same tokenization (lowercased alnum runs), same md5 32-bit-prefix
    dimension hash, same ``(h >> 15) % 2`` sign bit, same smoothed IDF
    and L2 normalization -- a text embedded here lands in the identical
    space as the indexed chunks (parity pinned in tests). Pure Python,
    request-sized: exactly what a query front end calls per search."""
    tf: dict[int, float] = {}
    for w in _TOKEN_RE.findall((text or "").lower()):
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        sign = ((h >> 15) % 2) * 2 - 1
        dim = h % dims
        tf[dim] = tf.get(dim, 0.0) + float(sign)
    default = _default_idf(n_docs)
    vec = [0.0] * dims
    for dim, t in tf.items():
        vec[dim] = t * idf.get(dim, default)
    norm = math.sqrt(sum(x * x for x in vec))
    if norm > 0:
        vec = [x / norm for x in vec]
    return vec


def build_chunk_search_index(
    wh,
    docs: DataFrame,
    name: str,
    chunk_words: int = 64,
    stride: int = 48,
    dims: int = 64,
    kmeans_stride: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    kmeans_iters: int = 1,
) -> dict:
    """Chunk the corpus, fit the hashed-IDF model, embed every chunk,
    and commit the persisted IVF index plus the embed geometry.
    Returns {"chunks": n, "cells": n, "vectors": n}."""
    from .selection import hashed_embedding_fit
    from .similarity import build_ivf_index
    from .text import chunk_documents

    chunks = chunk_documents(docs, chunk_words, stride, text_col, id_col)
    key = F.when(
        (F.col("chunk_id") >= 0)
        & (F.col("chunk_id") < CHUNK_SHIFT)
        & (F.col(id_col).cast("long") >= 0)
        & (F.col(id_col).cast("long") < F.lit(1 << 43)),
        F.col(id_col).cast("long") * CHUNK_SHIFT + F.col("chunk_id"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("chunk key overflow: doc "),
                F.col(id_col).cast("string"),
                F.lit(" chunk "),
                F.col("chunk_id").cast("string"),
            )
        )
    )
    keyed = chunks.select(key.alias("chunk_key"), F.col("chunk_text"))
    # ONE tokenize+hash pass for fit AND transform (r16): the fused
    # hashed_embedding_fit pins the hashed token matrix internally --
    # the IDF rollup materializes it and the embedding assembly reads
    # it -- where the old hashed_idf_model + hashed_embedding pair ran
    # the chunk explode + tokenize + md5 twice. Downstream,
    # build_ivf_index's shared quantized pin keeps the embedding
    # lineage to one execution (the other half of the r15 VERDICT #4
    # "plan string too large" cold-pass fix).
    emb, idf, n_docs = hashed_embedding_fit(
        keyed, dims, text_col="chunk_text", id_col="chunk_key"
    )
    cfg_name = f"{name}.embed_config"
    cfg_df = wh.spark.createDataFrame(
        [(
            json.dumps(
                {
                    "dims": dims,
                    "chunk_words": chunk_words,
                    "stride": stride,
                    "text_col": text_col,
                    "n_docs": n_docs,
                    "idf": {str(k): v for k, v in idf.items()},
                }
            ),
        )],
        "config string",
    )
    # the embed geometry rides build_ivf_index's OWN transaction
    # (extra_tables): a separate commit after the index could crash in
    # between on a rebuild and pair the new index with STALE geometry --
    # same-dims queries would then embed in the old space with no error
    # seed_hash: the packed chunk_key space is structured, so raw
    # id-modulus seeding degenerates (stride 50 and 200 pick the SAME
    # seeds -- both reduce to doc_id % 25 == 0); hashing the key first
    # makes n_cells actually track n_chunks / kmeans_stride
    stats = build_ivf_index(
        wh, emb, name, stride=kmeans_stride, iters=kmeans_iters, dims=dims,
        id_col="chunk_key", vec_col="embedding",
        extra_tables=[(cfg_name, cfg_df)],
        seed_hash=True,
    )
    return {"chunks": stats["vectors"], **stats}


def search_chunks_many(
    wh,
    name: str,
    queries: dict[int, str],
    k: int = 5,
    n_probes: int = 2,
) -> DataFrame:
    """Batched form of ``search_chunks`` -- the shape a serving front
    end actually calls (one request wave, one partition-pruned scan
    covering every query's probed cells instead of one scan per
    query). ``queries``: {query_id: text}. Output: (query_id, doc_id,
    chunk_id, cosine).

    ``n_probes`` is the recall knob: per-query cost is ~probes/cells
    of the corpus, and recall tracks that fraction on diffuse corpora
    (measured curve in SCALE.md round 10); the default 2 doubles
    recall over single-probe for one extra pruned cell read."""
    from .similarity import ivf_search_index

    cfg = _load_embed_config(wh, name)
    vecs = [
        (qid, embed_text(text, cfg["idf"], cfg["n_docs"], cfg["dims"]))
        for qid, text in sorted(queries.items())
    ]
    hits = ivf_search_index(wh, name, vecs, k=k, n_probes=n_probes, id_col="chunk_key")
    return hits.select(
        "query_id",
        F.expr(f"neighbor_id div {CHUNK_SHIFT}").cast("long").alias("doc_id"),
        (F.col("neighbor_id") % CHUNK_SHIFT).cast("long").alias("chunk_id"),
        "cosine",
    )


def _load_embed_config(wh, name: str) -> dict:
    cfg_name = f"{name}.embed_config"
    if not wh.exists(cfg_name):
        raise ValueError(
            f"{cfg_name} not found: index was not built by "
            f"build_chunk_search_index (or predates it); searching with "
            f"ad-hoc geometry would embed the query in the wrong space"
        )
    raw = json.loads(wh.read(cfg_name).first()["config"])
    return {
        "dims": int(raw["dims"]),
        "n_docs": int(raw["n_docs"]),
        "chunk_words": int(raw["chunk_words"]),
        "stride": int(raw["stride"]),
        # pre-r11 configs predate text_col persistence; they were all
        # built with the then-hardcoded "text"
        "text_col": str(raw.get("text_col", "text")),
        "idf": {int(d): v for d, v in raw["idf"].items()},
    }


def ingest_chunks(wh, new_docs: DataFrame, name: str, id_col: str = "doc_id") -> int:
    """Incremental index growth: chunk + embed NEW documents under the
    PERSISTED geometry (stored chunk windows, stored IDF table, stored
    n_docs smoothing -- never refit, or new chunks would land in a
    different space than the index and every query) and append them
    through ``append_to_ivf_index`` (assignment against the stored
    codebook; idempotent on replayed ids). Returns chunks appended.

    The frozen-IDF posture is the standard between-rebuilds contract:
    recall degrades gracefully as vocabulary drifts from the fitted
    model, and the refresh path is a full ``build_chunk_search_index``
    rebuild (atomic overwrite of index + geometry together) on a
    schedule or an ``ivf_index_health`` trigger -- identical to the
    codebook's own no-retrain-on-append rule.

    The text column is read from the persisted geometry too (it is
    part of what the index was built FROM): an index built over a
    non-default ``text_col`` grows from the same column, instead of
    failing with a missing-'text'-column error unrelated to the real
    cause (r10 ADVICE)."""
    from .selection import hashed_embedding
    from .similarity import append_to_ivf_index
    from .text import chunk_documents

    cfg = _load_embed_config(wh, name)
    chunks = chunk_documents(
        new_docs, cfg["chunk_words"], cfg["stride"], cfg["text_col"], id_col
    )
    key = F.when(
        (F.col("chunk_id") >= 0)
        & (F.col("chunk_id") < CHUNK_SHIFT)
        & (F.col(id_col).cast("long") >= 0)
        & (F.col(id_col).cast("long") < F.lit(1 << 43)),
        F.col(id_col).cast("long") * CHUNK_SHIFT + F.col("chunk_id"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("chunk key overflow: doc "),
                F.col(id_col).cast("string"),
                F.lit(" chunk "),
                F.col("chunk_id").cast("string"),
            )
        )
    )
    keyed = chunks.select(key.alias("chunk_key"), F.col("chunk_text"))
    emb = hashed_embedding(
        keyed,
        cfg["dims"],
        text_col="chunk_text",
        id_col="chunk_key",
        idf_model=_filled_model(cfg["idf"], cfg["n_docs"], cfg["dims"]),
    )
    return append_to_ivf_index(
        wh, emb, name, id_col="chunk_key", vec_col="embedding"
    )


def search_chunks(
    wh,
    name: str,
    text: str,
    k: int = 5,
    n_probes: int = 2,
) -> DataFrame:
    """k nearest chunks for a query TEXT against a
    ``build_chunk_search_index`` index: embed driver-side under the
    PERSISTED geometry, partition-pruned cell search, decode the packed
    key. Output: (doc_id, chunk_id, cosine)."""
    return search_chunks_many(wh, name, {0: text}, k=k, n_probes=n_probes).drop(
        "query_id"
    )


def semantic_decontaminate(
    wh,
    name: str,
    eval_docs: DataFrame,
    threshold: float = 0.85,
    k: int = 8,
    n_probes: int = 4,
    eval_id_col: str = "eval_id",
    text_col: str | None = None,
) -> DataFrame:
    """SEMANTIC eval-set decontamination against the persisted chunk
    index: for every eval document, find training-corpus chunks whose
    embedding cosine clears ``threshold`` -- the paraphrase-grade
    contamination the exact family (n-gram pairs, Bloom digests,
    duplicated spans) cannot see, because a reworded eval question
    shares no grams with its source. Output: (eval_id, doc_id,
    chunk_id, cosine), one row per flagged (eval doc, corpus chunk);
    anti-join the distinct doc_ids out of the corpus (or route to
    review) to decontaminate.

    Composition of verified kernels, nothing new in the plan: eval
    texts embed under the index's PERSISTED geometry via the same
    distributed transform the chunks used (hashed_embedding + frozen
    IDF -- same space by construction, the parity the semsearch tests
    pin), then ``ivf_search_frame`` probes the cell-pruned index
    (corpus-scale query frames supported -- a 100k-question eval suite
    is one frame, not 100k driver calls).

    Recall contract is the IVF one: a contaminated chunk in an
    unprobed cell is missed; ``n_probes`` (default 4, twice the
    search default) is the recall knob, and the exact family remains
    the backstop for verbatim leaks. MEASURED (r12,
    tools/probe_semdecon_quality.py on the sf0.01/sf0.001 corpora;
    floors pinned in tests/test_semdecon_quality.py): paraphrase-grade
    rewording (reorder + ~15% drop/substitute) scores 0.9-0.95 and
    flags COMPLETELY at threshold 0.85 under exact search; the probe
    knob traces recall 0.52/0.82/0.94/1.0 at probes 1/2/4/all;
    fully out-of-vocabulary text never flags at any threshold >= 0.5.
    ``threshold`` calibration is CORPUS-DEPENDENT through the IDF
    geometry: on narrow-vocabulary corpora, 50%-token-overlap topical
    text scores up to ~0.9 (separation arrives at threshold ~0.9);
    on diverse prose (the pytest fixtures) topical similarity sits at
    ~0.3-0.6 and the 0.85 default separates cleanly. Sweep the probe
    tool on a corpus sample before trusting a threshold."""
    from .retrieval import ivf_search_frame
    from .selection import hashed_embedding

    cfg = _load_embed_config(wh, name)
    tcol = text_col or cfg["text_col"]
    emb = hashed_embedding(
        eval_docs,
        cfg["dims"],
        text_col=tcol,
        id_col=eval_id_col,
        idf_model=_filled_model(cfg["idf"], cfg["n_docs"], cfg["dims"]),
    )
    hits = ivf_search_frame(
        wh, name,
        emb.select(F.col(eval_id_col).alias("query_id"), "embedding"),
        k=k, n_probes=n_probes, id_col="chunk_key",
    )
    return hits.filter(F.col("cosine") >= threshold).select(
        F.col("query_id").alias("eval_id"),
        F.expr(f"neighbor_id div {CHUNK_SHIFT}").cast("long").alias("doc_id"),
        (F.col("neighbor_id") % CHUNK_SHIFT).cast("long").alias("chunk_id"),
        "cosine",
    )
