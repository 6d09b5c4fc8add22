"""Fuzzy string matching and keyword relevance scoring.

Entity-resolution and retrieval primitives for the training-data
pipeline: blocked edit-distance pairs (dedup/merge of near-identical
names/titles) and exact TF-IDF-style keyword scoring (corpus
filtering by topic terms). Both are pure built-in expressions --
`levenshtein` and the word explode run JVM-side, no Python.

Scale discipline mirrors the LSH modules: NEVER all-pairs. The
edit-distance join requires blocking keys (a self-join inside blocks
only), and block sizes are data-dependent -- with a fixed name
vocabulary blocks grow linearly with the corpus and pair counts
quadratically, exactly like hot LSH buckets. ``max_block`` applies
the same deterministic cap-and-drop escape hatch (monitor via the
returned sizes; capped blocks mean refine the blocking key). The
TF-IDF side is two narrow aggregations plus a broadcast of the
(tiny) per-term document-frequency table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int,
    max_block: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) within the same block whose ``text_col``
    edit distance is <= ``max_distance``. Output columns: block cols,
    id_a, id_b, name_a, name_b, distance. ``max_block`` (optional)
    caps block size by deterministic hash sample, trading recall for
    a hard O(block * cap) bound -- same contract as the LSH bucket
    cap; leave None where the blocking key is known-selective."""
    base = df.select(*block_cols, F.col(id_col), F.col(text_col))
    if max_block is not None:
        sizes = base.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__bs"))
        base = (
            base.join(F.broadcast(sizes), on=block_cols)
            .filter(
                (F.col("__bs") <= max_block)
                | (
                    F.pmod(F.xxhash64(F.col(id_col)), (F.col("__bs") / max_block).cast("long") + 1)
                    == 0
                )
            )
            .drop("__bs")
        )
    # Pin: both self-join sides read one scan of the blocked frame
    base = base.localCheckpoint(eager=False)
    a = base.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("name_a"),
    )
    b = base.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("name_b"),
    )
    return (
        a.join(b, on=block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
    )


def keyword_tfidf_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document relevance for ``terms``: sum over matched terms of
    ``tf * N / df`` (raw inverse document frequency -- kept log-free
    so the arithmetic is exact-portable across engines; swap in
    log-idf for production ranking). Documents matching no term are
    absent. One explode + two narrow aggregations; df table
    broadcasts."""
    # Pin the matched (id, term) rows: tf and df both derive from one
    # corpus scan + explode instead of two (the explode over 100 TB of
    # text is the dominant cost; the pinned frame holds only matching
    # terms, so it is tiny)
    words = (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .filter(F.col("term").isin(terms))
        .localCheckpoint(eager=False)
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("n") / F.col("df")).alias("score"))
    )
