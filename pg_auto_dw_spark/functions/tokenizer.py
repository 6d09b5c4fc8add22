"""Real BPE tokenization: corpus-statistics training + distributed apply.

``text.token_counts`` gives the cheap regex PROXY for token budgeting;
this module gives the exact counts a real tokenizer produces, split the
way a 100 TB pipeline must split it:

- ``bpe_train``: byte-pair-encoding merge learning (Sennrich et al.
  2016, arXiv:1508.07909). The corpus-sized work -- the word-frequency
  aggregation -- is fully distributed (one map-side-combined groupBy);
  only the BOUNDED top-``max_vocab_words`` (word, count) table collects
  to the driver, where the inherently-sequential merge loop runs over
  the frequency dict (cost O(vocab x merges), independent of corpus
  size). This is exact-statistics training, strictly stronger than the
  industry sample-a-shard practice, at the same bounded driver cost.
- ``bpe_apply`` / ``bpe_token_counts``: distributed application via
  Arrow ``mapInPandas`` (a sanctioned Python path, like
  ``text.compression_ratio``) with the merge ranks broadcast in the
  closure. Per-batch word->tokens memoization exploits Zipf: each
  distinct word is segmented once per batch regardless of frequency.

Determinism: merge selection breaks count ties lexicographically, so
the same corpus always yields the same merge list on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import word_tokens

END = "</w>"  # end-of-word sentinel symbol


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab_words: int = 100_000,
) -> list[tuple[str, int]]:
    """Top-``max_vocab_words`` (word, count) pairs, ordered by count
    desc then word asc. The ONLY collect in training, bounded by
    construction; the aggregation underneath is one map-side-combined
    shuffle over the tokenized corpus."""
    counts = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_vocab_words)
    )
    return [(r["w"], r["n"]) for r in counts.collect()]


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == pair:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). Stops early when no pair
    occurs twice."""
    vocab = {
        tuple(list(w) + [END]): n
        for w, n in word_frequencies(docs, text_col, id_col, max_vocab_words)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(s, pair): n for s, n in vocab.items()}
    return merges


def _segment(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply merges to one word in rank order (the standard greedy
    lowest-rank-first loop)."""
    symbols = tuple(list(word) + [END])
    while len(symbols) > 1:
        best_rank = None
        best_pair = None
        for a, b in zip(symbols, symbols[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        symbols = _merge_word(symbols, best_pair)
    return symbols


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
    with_word_counts: bool = False,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, passthrough...], n_bpe_tokens[, n_words][, tokens]): exact
    BPE token counts for every document. Arrow ``mapInPandas`` with the
    merge-rank dict in the closure (broadcast once per executor by
    Spark's task serialization; bounded at ``n_merges`` entries). Word
    segmentations are memoized per batch -- Zipf makes the distinct-word
    set per batch far smaller than the token stream. No shuffle
    anywhere: a pure map. ``passthrough`` columns ride along untouched
    (aggregating consumers like ``tokenizer_stats`` group on them
    without a doc-grain join back to the input)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    # ids/passthrough pass through untouched, so their output types are
    # whatever the input declares (string doc ids are as legal as
    # bigint ones -- the sibling operators pack_sequences/bloom/shard
    # are id-type agnostic)
    schema_parts = [
        f"{c} {docs.schema[c].dataType.simpleString()}"
        for c in (id_col, *passthrough)
    ]
    schema_parts.append("n_bpe_tokens bigint")
    if with_word_counts:
        schema_parts.append("n_words bigint")
    if with_tokens:
        schema_parts.append("tokens array<string>")
    schema = ", ".join(schema_parts)

    def kernel(it):
        import re

        import pandas as pd

        cache: dict[str, tuple[str, ...]] = {}
        tok_re = re.compile(r"[a-z0-9]+")

        def seg(word: str) -> tuple[str, ...]:
            got = cache.get(word)
            if got is None:
                got = _segment(word, ranks)
                cache[word] = got
            return got

        for pdf in it:
            counts: list[int] = []
            wcounts: list[int] = []
            toks_col: list[list[str]] = []
            for text in pdf[text_col]:
                words = tok_re.findall(text.lower()) if text else []
                total = 0
                toks: list[str] = []
                for w in words:
                    s = seg(w)
                    total += len(s)
                    if with_tokens:
                        toks.extend(s)
                counts.append(total)
                if with_word_counts:
                    wcounts.append(len(words))
                if with_tokens:
                    toks_col.append(toks)
            out = {c: pdf[c] for c in (id_col, *passthrough)}
            out["n_bpe_tokens"] = pd.array(counts, dtype="int64")
            if with_word_counts:
                out["n_words"] = pd.array(wcounts, dtype="int64")
            if with_tokens:
                out["tokens"] = toks_col
            yield pd.DataFrame(out)

    return docs.select(id_col, *passthrough, text_col).mapInPandas(kernel, schema)


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train-then-count convenience: exact BPE token counts under a
    corpus-fit tokenizer -- the precise input ``token_budget_sample``
    style operators want when the regex proxy is not enough."""
    merges = bpe_train(docs, n_merges, text_col, id_col)
    return bpe_apply(docs, merges, text_col, id_col)


def tokenizer_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group tokenizer-efficiency audit: the fertility / coverage
    numbers a team checks before committing a tokenizer to a corpus
    mix (a vocabulary fit to one source tokenizes another source into
    many more pieces -- this is where that shows up, per source).

    Output: (group, n_docs, total_words, total_bpe_tokens, total_chars,
    tokens_per_100_words, chars_per_100_tokens) -- the two ratios by
    exact INTEGER division (x100 fixed-point), so every emitted column
    is BIGINT/string and a future oracle row hashes exactly.

    Shape: ONE Arrow map pass (``bpe_apply`` with the group column and
    a precomputed char count riding through -- no doc-grain join back
    to the input, no second corpus scan) followed by one
    map-side-combined groupBy bounded at the group count."""
    per = bpe_apply(
        docs.withColumn(
            "__chars", F.coalesce(F.length(text_col).cast("long"), F.lit(0))
        ),
        merges,
        text_col=text_col,
        id_col=id_col,
        with_word_counts=True,
        passthrough=(group_col, "__chars"),
    )
    return (
        per.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            F.sum("__chars").alias("total_chars"),
        )
        .select(
            group_col,
            "n_docs",
            "total_words",
            "total_bpe_tokens",
            "total_chars",
            F.expr("100 * total_bpe_tokens div greatest(total_words, 1)").alias(
                "tokens_per_100_words"
            ),
            F.expr("100 * total_chars div greatest(total_bpe_tokens, 1)").alias(
                "chars_per_100_tokens"
            ),
        )
    )


def bpe_vocab_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merges as a (rank, left, right, merged) DataFrame --
    the persistable tokenizer artifact (write it through warehouse.py
    like any other model table)."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank bigint, left string, right string, merged string")
