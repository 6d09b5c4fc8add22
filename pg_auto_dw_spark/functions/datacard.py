"""Corpus data card: the per-(source, lang) dataset report a training
team publishes alongside a corpus (datasheets / data-statements
practice: Gebru et al. 2021, arXiv:1803.09010) and re-runs per ingest
window to catch composition drift.

One aggregation pass computes everything: doc/char/token totals,
length distribution (exact min/max + approximate quantiles), the
Gopher quality-rule pass rate (the rule expressions composed INLINE
via ``text.gopher_exprs`` -- no doc-grain join against a verdict
frame), empty-text and short-doc counts, and the exact-duplicate rate
(distinct sha2 text digests vs docs). Output is bounded at the group
count; nothing downstream of the single map-side-combined shuffle
scales with the corpus.

At 100 TB this is the ANALYZE-altitude companion to
``catalog.profile.profile_table``: same one-pass conditional-aggregate
posture, pointed at the training-corpus questions (how much of each
source/language, how clean, how duplicated) instead of the warehouse
ones. Reference analog: none (its governance stops at column
profiling); cited as additive pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import gopher_exprs


def corpus_datacard(
    docs: DataFrame,
    keys: list[str] | None = None,
    text_col: str = "text",
    min_words: int = 50,
    min_stopwords: int = 2,
) -> DataFrame:
    """One row per group with the data-card statistics.

    Columns: keys..., n_docs, n_empty, n_distinct_texts, n_exact_dups,
    n_gopher_pass, n_short, total_chars, total_words, min_chars,
    max_chars, median_chars (approx), p95_chars (approx),
    total_stopword_hits. Counts are BIGINT; the two quantiles are the
    only approximate fields (percentile_approx, mergeable sketch) and
    are clearly named as distribution fields. ``min_stopwords``
    forwards to the Gopher verdict (``gopher_rules`` exposes the same
    knob -- a corpus whose vocabulary carries few canonical stop words
    needs it for the rule to vary)."""
    keys = keys if keys is not None else ["source", "lang"]
    t = F.col(text_col)
    counts, _rules, verdict = gopher_exprs(
        t, min_words=min_words, min_stopwords=min_stopwords
    )
    n_words = counts["n_words"]
    nonempty = t.isNotNull() & (F.length(F.trim(t)) > 0)
    chars = F.length(t).cast("long")
    return docs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(~nonempty, F.lit(1))).alias("n_empty"),
        F.countDistinct(F.when(nonempty, F.sha2(t, 256))).alias("n_distinct_texts"),
        (
            F.count(F.when(nonempty, F.lit(1)))
            - F.countDistinct(F.when(nonempty, F.sha2(t, 256)))
        ).alias("n_exact_dups"),
        F.count(F.when(verdict, F.lit(1))).alias("n_gopher_pass"),
        F.count(F.when(nonempty & (n_words < min_words), F.lit(1))).alias("n_short"),
        F.sum(F.coalesce(chars, F.lit(0))).alias("total_chars"),
        F.sum(F.when(nonempty, n_words).otherwise(F.lit(0))).alias("total_words"),
        F.min(chars).alias("min_chars"),
        F.max(chars).alias("max_chars"),
        F.percentile_approx(chars, 0.5).alias("median_chars"),
        F.percentile_approx(chars, 0.95).alias("p95_chars"),
        F.sum(F.when(nonempty, counts["n_stopwords_present"]).otherwise(F.lit(0))).alias(
            "total_stopword_hits"
        ),
    )


def datacard_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    keys: list[str] | None = None,
    text_col: str = "text",
    min_words: int = 50,
    min_stopwords: int = 2,
    rel_threshold: float = 0.5,
) -> DataFrame:
    """Composition-drift report between two corpus versions (ingest
    windows, snapshots): the data cards of both sides full-outer-joined
    on the group keys, with integer deltas for the load-bearing fields
    and a per-group ``drifted`` flag when doc count, duplicate count,
    or Gopher pass count moved by more than ``rel_threshold``
    relatively (a group present on only one side always flags --
    appearing/disappearing sources are the loudest composition
    change).

    This is the datacard twin of the PSI drift monitor: PSI watches a
    VALUE distribution; this watches the per-(source, lang) corpus
    COMPOSITION a training mix is specified against. Two one-pass
    conditional aggregations + one group-sized join; everything
    downstream of the two scans is bounded at the group count."""
    keys = keys if keys is not None else ["source", "lang"]
    fields = ["n_docs", "n_exact_dups", "n_gopher_pass", "total_words"]
    old = corpus_datacard(old_docs, keys, text_col, min_words, min_stopwords)
    new = corpus_datacard(new_docs, keys, text_col, min_words, min_stopwords)
    o = old.select(*keys, *[F.col(c).alias(f"{c}_old") for c in fields])
    n = new.select(*keys, *[F.col(c).alias(f"{c}_new") for c in fields])
    j = o.join(n, on=keys, how="full_outer")
    both = F.col("n_docs_old").isNotNull() & F.col("n_docs_new").isNotNull()

    def rel_moved(c: str):
        o_, n_ = F.coalesce(F.col(f"{c}_old"), F.lit(0)), F.coalesce(
            F.col(f"{c}_new"), F.lit(0)
        )
        return F.abs(n_ - o_).cast("double") > F.lit(rel_threshold) * F.greatest(
            o_, F.lit(1)
        ).cast("double")

    drifted = ~both
    for c in ("n_docs", "n_exact_dups", "n_gopher_pass"):
        drifted = drifted | rel_moved(c)
    out = j.select(
        *keys,
        *[F.col(f"{c}_old") for c in fields],
        *[F.col(f"{c}_new") for c in fields],
        *[
            (
                F.coalesce(F.col(f"{c}_new"), F.lit(0))
                - F.coalesce(F.col(f"{c}_old"), F.lit(0))
            ).alias(f"{c}_delta")
            for c in fields
        ],
        drifted.alias("drifted"),
    )
    return out
