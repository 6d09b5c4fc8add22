"""Composed corpus-cleaning pipeline: the end-to-end flow a
training-data user actually runs over the ``documents`` table --
language filter + quality gates + near-dup canonicalization + token
budgeting -- built from the individual operators in this package.

Scale shape: all per-document features (language, word count, alpha
ratio, BPE-ish token count) are computed in ONE projection over ONE
scan -- no joins between the feature operators, which would each
re-scan and shuffle a 100 TB corpus on doc_id. The only join is one
``left_semi`` against the (narrow) canonical-id set from dedup
clustering, and the summary is a map-side-combined aggregate over a
handful of language keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, minhash_lsh_candidates
from .text import language_expr


def clean_corpus(
    docs: DataFrame,
    min_words: int = 5,
    min_alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, detected_lang, n_words, alpha_ratio, n_bpe_tokens) for
    documents that survive cleaning: identified language, at least
    ``min_words`` words, alpha ratio >= ``min_alpha``, and canonical
    within their near-dup cluster (cluster_id == doc_id keeps exactly
    one representative per duplicate group)."""
    t = F.col(text_col)
    feats = docs.select(
        F.col(id_col),
        language_expr(t).alias("detected_lang"),
        F.size(F.split(F.trim(t), r"\s+")).cast("long").alias("n_words"),
        (
            F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]"), 0)).cast("double")
            / F.length(t)
        ).alias("alpha_ratio"),
        F.size(
            F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)
        ).cast("long").alias("n_bpe_tokens"),
    )
    canon = (
        connected_components(minhash_lsh_candidates(docs, id_col=id_col), nodes=docs, id_col=id_col)
        .filter(F.col(id_col) == F.col("cluster_id"))
        .select(id_col)
    )
    return feats.join(canon, id_col, "left_semi").filter(
        (F.col("detected_lang") != "und")
        & (F.col("n_words") >= min_words)
        & (F.col("alpha_ratio") >= min_alpha)
    )


def clean_corpus_summary(
    docs: DataFrame,
    min_words: int = 5,
    min_alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(detected_lang, n_docs, total_tokens): the post-cleaning corpus
    composition -- what a pretraining-mix dashboard reports."""
    return (
        clean_corpus(docs, min_words, min_alpha, text_col, id_col)
        .groupBy("detected_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("total_tokens"),
        )
    )
