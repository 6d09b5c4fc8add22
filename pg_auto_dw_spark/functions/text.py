"""Text-analysis operators for training-data pipelines over the
``documents`` table: language ID, quality scoring, token counting,
fingerprinting.

All pure built-in expressions (regexp_extract_all / split / md5 /
arithmetic) -- JVM-side, codegen'd, no Python UDFs -- so they scale
linearly with the scan and survive a 100 TB corpus: every operator is
a narrow per-row map with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Distinctive stopwords per language for the n-gram/stopword-count
# language heuristic. Deliberately tiny: the point is the operator
# shape (vectorized regex counting + deterministic argmax), not model
# quality -- do NOT ship this 4-language table as a production
# classifier. The production swap-in keeps the same call sites:
# either widen this table (more languages x more stopwords -- stays
# pure-JVM, the cheap tier), or replace language_expr's consumer with
# an Arrow-batched mapInPandas stage loading a real model (e.g. a
# fastText lid.176 binary broadcast to executors, batched predict per
# Arrow chunk) emitting the same (id, detected_lang) shape the
# pipeline joins on. The composed corpus pipeline only depends on
# that column contract, not on how the language was inferred.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht"],
    "en": ["the", "and", "of", "is", "not"],
    "es": ["el", "la", "de", "que", "no"],
    "fr": ["le", "la", "et", "est", "pas"],
}


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    lower = F.lower(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        out[lang] = _count_matches(lower, pattern)
    return out


def language_expr(text: Column) -> Column:
    """Detected-language column: stopword-count argmax (highest count
    wins; ties break on language code ascending; all-zero -> 'und').
    Exposed as a bare expression so composed pipelines can fold it into
    a single scan."""
    scores = lang_scores(text)
    langs = sorted(scores)
    # fold languages in reverse alphabetical order with >=, so the
    # alphabetically-first language (applied last) wins exact ties
    expr_lang, expr_score = F.lit("und"), F.lit(0)
    for lang in reversed(langs):
        expr_lang = F.when(scores[lang] >= expr_score, F.lit(lang)).otherwise(expr_lang)
        expr_score = F.when(scores[lang] >= expr_score, scores[lang]).otherwise(expr_score)
    zero = F.lit(True)
    for lang in langs:
        zero = zero & (scores[lang] == 0)
    return F.when(zero, F.lit("und")).otherwise(expr_lang)


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-count language ID with per-language scores."""
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)
    cols = [
        F.col(id_col),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs],
    ]
    return df.select(*cols, language_expr(F.col(text_col)).alias("detected_lang"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: lengths, word counts, punctuation /
    digit / uppercase / stopword ratios, mean word length."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_punct = _count_matches(t, r"[^\sA-Za-z0-9]")
    n_digit = _count_matches(t, r"[0-9]")
    n_upper = _count_matches(t, r"[A-Z]")
    n_stop = _count_matches(F.lower(t), r"\b(the|and|of|is|a|to|in|not)\b")
    n_alpha_chars = _count_matches(t, r"[A-Za-z]")
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        (n_alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_digit.cast("double") / n_chars).alias("digit_ratio"),
        (n_upper.cast("double") / n_chars).alias("upper_ratio"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
        (n_alpha_chars.cast("double") / n_words).alias("mean_word_len"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens plus a BPE-ish pre-tokenizer count (runs of
    alphanumerics, or single non-space symbols) -- the standard cheap
    proxy for LLM token budgeting."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = _count_matches(t, r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 3
) -> DataFrame:
    """Intra-document repetition (Gopher/RefinedWeb-style quality
    heuristics): share of duplicate k-character shingles and duplicate
    words within each document. Pure array expressions (size vs
    size(array_distinct)) -- narrow per-row map, integer-exact ratios."""
    t = F.col(text_col)
    # Bind normalization and gram array to columns before the ratio
    # projection: the gram lambda re-evaluates every referenced subtree
    # per element, and the ratios reference the gram array three times.
    norm = F.regexp_replace(F.lower(t), r"\s+", " ")
    n = F.greatest(F.length(F.col("__norm")) - F.lit(shingle_k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(F.col("__norm"), i, shingle_k)
    )
    return (
        df.select(F.col(id_col), norm.alias("__norm"))
        .select(
            F.col(id_col),
            grams.alias("__grams"),
            F.split(F.trim(F.col("__norm")), " ").alias("__words"),
        )
        .select(
            F.col(id_col),
            F.size("__grams").cast("long").alias("n_grams"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct("__grams")).cast("double") / F.size("__grams")
            ).alias("dup_gram_ratio"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct("__words")).cast("double") / F.size("__words")
            ).alias("dup_word_ratio"),
        )
    )


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum to
    spaces, collapse, then sorted unique tokens joined by single spaces
    (the OpenRefine-style key-collision fingerprint)."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")
    toks = F.array_distinct(F.split(F.trim(cleaned), r"\s+"))
    return F.array_join(F.array_sort(toks), " ")


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Doc fingerprints: raw sha256 (exact-dup key) + md5 of the
    normalized token set (near-canonical dup key)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.sha2(t, 256).alias("exact_hash"),
        F.md5(normalized_text(t)).alias("fingerprint"),
    )


def chunk_documents(
    df,
    chunk_words: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Context-window chunking for LLM training: split each document
    into word-windows of ``chunk_words`` advancing by ``stride``
    (overlap = chunk_words - stride). Output grain: (doc, chunk_id)
    with the chunk text and its word count; every word is covered, the
    last window may be short, and a doc shorter than one window yields
    exactly one chunk.

    Pure built-ins (split / sequence / slice / array_join) -- the
    explode multiplies rows by ~n_words/stride with zero Python and no
    shuffle; at 100 TB this is scan-bound, exactly like the shingle
    builders. Token-exact chunking (BPE) swaps the word split for a
    tokenizer via mapInPandas with the same output contract."""
    from pyspark.sql import functions as F

    if stride <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride must be positive")
    words = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.size(words) - F.lit(chunk_words)) / F.lit(stride)
        ).cast("long")
        + F.lit(1),
    )
    chunked = df.select(
        F.col(id_col),
        words.alias("__w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__w"), F.col("chunk_id") * stride + 1, chunk_words
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_words"),
    )


# PII patterns shared by the Spark operator and the DuckDB oracle: the
# subset of regex syntax identical between Java regex and RE2
# (character classes, bounded repetition; no lookaround, no \d/\b
# shorthand differences to worry about).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ip": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for training corpora: replace emails, phone
    numbers, and IPv4 literals with typed placeholders and count each
    category. Order matters (IP before phone would misfire on dotted
    quads inside emails -- emails are struck first, then phones, then
    IPs over the already-redacted text).

    Pure built-in ``regexp_replace``/``regexp_count`` -- zero shuffle,
    zero Python, scan-bound at any scale. Production swap-ins (NER-
    based person-name redaction) ride the same mapInPandas contract as
    the language-ID note at the top of this module.

    Output: (id, redacted text, n_emails, n_phones, n_ips).
    """
    out = df.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS["email"])).alias("n_emails"),
    )
    out = out.withColumn(
        "__t", F.regexp_replace("__t", PII_PATTERNS["email"], "<EMAIL>")
    )
    out = out.withColumn(
        "n_phones", F.regexp_count(F.col("__t"), F.lit(PII_PATTERNS["phone"]))
    ).withColumn("__t", F.regexp_replace("__t", PII_PATTERNS["phone"], "<PHONE>"))
    out = out.withColumn(
        "n_ips", F.regexp_count(F.col("__t"), F.lit(PII_PATTERNS["ip"]))
    ).withColumn("__t", F.regexp_replace("__t", PII_PATTERNS["ip"], "<IP>"))
    return out.select(
        id_col,
        F.col("__t").alias("redacted_text"),
        "n_emails",
        "n_phones",
        "n_ips",
    )


def _tokens_exploded(df: DataFrame, text_col: str, id_col: str, normalized: bool):
    """(id, w) token stream: raw whitespace split by default, or the
    ``word_tokens`` lowercase-alnum normalization shared with the corpus
    operators (``normalized=True``). The normalized path is what the
    oracle-hashed catalog rows use -- it is the tokenization already
    proven to hash-match across engines (corpus_decontaminate,
    text_fingerprints), unlike raw '\\s+' splitting whose engine-side
    regex/trim edge cases diverged in the driver environment."""
    # fan docs across cores before the explode (minhash/gram precedent)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    if normalized:
        from .corpus import word_tokens

        return df.select(
            F.col(id_col),
            F.explode(word_tokens(F.col(text_col))).alias("w"),
        )
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")


def word_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int | None = 6,
    normalized: bool = False,
) -> DataFrame:
    """Per-document unigram Shannon entropy (bits): the standard cheap
    gibberish/repetition signal -- near-zero for a doc that repeats one
    token, high for diverse text; quality pipelines band-pass it.

    Shape: explode words -> one (id, word) count shuffle (map-side
    combined) -> one (id) rollup computing H = log2(N) - sum(c*log2(c))/N
    (algebraically -sum(p log2 p), but summing integer-count terms
    avoids a join against the doc-length relation). Rounded to
    ``decimals`` because transcendental libm results may differ in the
    last ulp across engines (the moment-aggregates precedent);
    ``decimals=None`` returns the raw double for callers that do their
    own grid quantization (the scaled-BIGINT oracle rows).

    Output: (id, n_words, n_distinct_words, entropy_bits)."""
    words = _tokens_exploded(df, text_col, id_col, normalized)
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        wc.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias(
                "__clogc"
            ),
        )
        .select(
            id_col,
            "n_words",
            "n_distinct_words",
            _maybe_round(
                F.log2(F.col("n_words").cast("double"))
                - F.col("__clogc") / F.col("n_words").cast("double"),
                decimals,
            ).alias("entropy_bits"),
        )
    )


def _maybe_round(col, decimals: int | None):
    return col if decimals is None else F.round(col, decimals)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int | None = 6,
    normalized: bool = False,
) -> DataFrame:
    """Per-document mean unigram log10-probability under the corpus's
    OWN unigram language model -- the CCNet-style perplexity-filter
    signal: documents made of globally rare tokens score low
    (gibberish/noise tail), template/boilerplate text scores high;
    pretraining pipelines band-pass or bucket on it. (A KenLM-backed
    score plugs into the same shape; the corpus-self LM needs no
    external model artifact.)

    Shape: explode words -> one (word) corpus-count shuffle (map-side
    combined; the model-build pass) -> scalar token total carried as a
    broadcast one-row frame (no driver round-trip) -> words-to-freq
    join (vocabulary-sized build side; AQE chooses broadcast when it
    fits -- NOT forced, Zipf vocabularies grow with corpus size) ->
    one (id) rollup. The words lineage is computed twice (model build
    + scoring); at warehouse scale persist the frequency table as its
    own model artifact and reuse it across corpora snapshots.

    Output: (id, n_tokens, avg_logprob), avg rounded to ``decimals``
    for cross-engine libm/summation-order parity (``decimals=None``
    leaves the raw double for caller-side grid quantization)."""
    # (id, w, c) term matrix: ONE tokenize pass; the corpus frequency
    # model is a rollup of the matrix and scoring joins the matrix
    # (count-weighted mean), not the raw token stream -- the r8 shape
    # shared with functions/selection.py's _doc_bucket_counts
    mat = _tokens_exploded(df, text_col, id_col, normalized).groupBy(
        id_col, "w"
    ).agg(F.count(F.lit(1)).alias("c"))
    freq = mat.groupBy("w").agg(F.sum("c").alias("n"))
    total = freq.agg(F.sum("n").alias("total"))
    return (
        mat.join(freq, on="w")
        .crossJoin(F.broadcast(total))  # one row, by construction
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            _maybe_round(
                F.sum(
                    F.col("c")
                    * F.log10(
                        F.col("n").cast("double") / F.col("total").cast("double")
                    )
                )
                / F.sum("c"),
                decimals,
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int | None = 6,
) -> DataFrame:
    """Per-document mean conditional bigram log10-probability under the
    corpus's OWN bigram language model -- the next quality tier above
    ``unigram_logprob``: a doc of common words in an incoherent ORDER
    scores low here while scoring fine on unigrams, so the pair
    band-passes word-salad spam that a unigram perplexity filter
    passes. P(w2|w1) = c(w1,w2) / sum_w c(w1,w) with both counts taken
    over bigram OCCURRENCES, so the model is exactly normalized over
    observed continuations (no out-of-vocabulary smoothing needed for
    corpus-self scoring; an external-corpus scorer would add stupid
    backoff to the unigram model at the same join).

    Shape: one scan binds the lowercase-alnum token array per row
    (``word_tokens``) and expands adjacent pairs positionally -- no
    window, no posexplode shuffle; the pair list is a pure array
    expression. Then one (w1,w2) count shuffle and one (w1) count
    shuffle (both map-side combined; together they ARE the model), a
    scoring join back on (w1,w2) and a broadcast-eligible join on (w1)
    (AQE decides -- Zipf head is small but the w1 vocabulary grows
    with the corpus, so the hint is NOT forced), and one (id) rollup.
    The pair lineage is computed twice (model build + scoring); at
    warehouse scale persist the two count tables as the model artifact
    and reuse across snapshots, exactly the unigram_logprob contract.

    Docs with fewer than two tokens have no bigrams and emit no row
    (same convention as the DuckDB oracle).

    Output: (id, n_bigrams, avg_logprob), rounded to ``decimals`` and
    intended to be hashed as DECIMAL(18,6) for engine parity."""
    from .corpus import word_tokens

    toks = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )
    pairs = toks.select(
        id_col,
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.struct(
                        F.element_at("__toks", i).alias("w1"),
                        F.element_at("__toks", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # (id, w1, w2, c) pair matrix: ONE pair-expansion pass; both model
    # counts are rollups of the matrix and scoring joins the matrix
    # (count-weighted mean) instead of raw pair instances -- smaller
    # join probes, pairs derived once (r8 matrix shape). Lazily pinned
    # (r16, guide section 2.4): the matrix has THREE consumers (cnt12,
    # cnt1, the scoring join) and exchange reuse does not fire across
    # them (the lambda-built pair expression defeats plan
    # canonicalization), so the unpinned plan re-ran the corpus
    # tokenize + pair explode + first aggregation three times per
    # action -- the plan showed three identical Scan->Generate->
    # HashAggregate->Exchange chains. One materialization now feeds
    # all three reads.
    mat = pairs.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    cnt12 = mat.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    cnt1 = mat.groupBy("w1").agg(F.sum("c").alias("c1"))
    return (
        mat.join(cnt12, on=["w1", "w2"])
        .join(cnt1, on="w1")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            _maybe_round(
                F.sum(
                    F.col("c")
                    * F.log10(F.col("c12").cast("double") / F.col("c1").cast("double"))
                )
                / F.sum("c"),
                decimals,
            ).alias("avg_logprob"),
        )
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    decimals: int = 6,
) -> DataFrame:
    """Per-document zlib compressibility -- the Gopher/RefinedWeb-style
    quality signal the pure-regex scores here cannot express: templated
    or looping text compresses far below natural prose, so pipelines
    drop the low-ratio tail (machine-generated spam) and flag the
    ~1.0 tail (random bytes/encrypted blobs). ratio = compressed/raw
    UTF-8 bytes; empty docs emit ratio NULL.

    This is deliberately the module's one PYTHON-path operator: a
    byte-level DEFLATE pass has no pyspark.sql.functions equivalent,
    which is exactly the sanctioned Arrow escape hatch -- one
    ``mapInPandas`` over the scan, zlib applied per Arrow batch, no
    shuffle, no per-row Python UDF. Deterministic for a fixed zlib
    level (RFC 1950 output is stable for a given library build; the
    SIGNAL -- relative ordering -- is stable across builds, which is
    what a threshold filter consumes). No cross-engine oracle by
    nature (DuckDB has no DEFLATE); pytest-covered."""
    import zlib

    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            raw = [
                t.encode("utf-8") if isinstance(t, str) else b""
                for t in pdf[text_col]
            ]
            n_bytes = [len(b) for b in raw]
            n_comp = [len(zlib.compress(b, level)) if b else 0 for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.array(n_bytes, dtype="int64"),
                    "n_compressed": pd.array(n_comp, dtype="int64"),
                    "compression_ratio": [
                        round(c / b, decimals) if b else None
                        for c, b in zip(n_comp, n_bytes)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel,
        f"{id_col} bigint, n_bytes bigint, n_compressed bigint, "
        "compression_ratio double",
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style rule-based document filter (Rae et al. 2021,
    arXiv:2112.11446 Table A1): the canonical pretraining-corpus
    heuristics as one verdict row per document -- word-count bounds,
    mean-word-length bounds, symbol-to-word ratio, bullet / ellipsis
    line shares, alphabetic-word share, and stop-word presence.

    Every ratio threshold is evaluated by INTEGER cross-multiplication
    (``10 * n_symbols <= n_words`` instead of ``n_symbols / n_words <=
    0.1``), so the emitted columns are BIGINT counts and BOOLEAN flags
    only -- no float ever enters the hashed bytes (the r7 VERDICT
    integer-only-output lesson applied from birth). One narrow
    projection per document: codegen regex counts, no explode, no
    shuffle, no UDF -- the 100 TB shape is a map-only scan."""
    counts, rules, verdict = gopher_exprs(
        F.col(text_col),
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        min_stopwords=min_stopwords,
    )
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in counts.items()],
        *[c.alias(name) for name, c in rules.items()],
        verdict.alias("gopher_pass"),
    )


def gopher_exprs(
    t,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stopwords: int = 2,
):
    """The Gopher rule EXPRESSIONS over a bound text column, for
    composition into other one-pass scans (``gopher_rules`` emits them
    per document; ``datacard.corpus_datacard`` aggregates the verdict
    per group without a doc-grain join). Returns (counts dict,
    rules dict, verdict column)."""
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words).cast("long")
    # total characters inside words == length with all whitespace removed
    n_word_chars = F.length(F.regexp_replace(t, r"\s+", "")).cast("long")
    n_symbols = _count_matches(t, r"#|\.\.\.").cast("long")
    lines = F.split(t, r"\n")
    n_lines = F.size(lines).cast("long")
    n_bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"\.\.\.$"))
    ).cast("long")
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
    ).cast("long")
    low = F.lower(t)
    n_stopwords_present = sum(
        F.when(low.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
        for w in GOPHER_STOPWORDS
    ).cast("long")
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (n_word_chars >= min_mean_word_len * n_words)
        & (n_word_chars <= max_mean_word_len * n_words),
        "rule_symbol_ratio": (F.lit(10) * n_symbols) <= n_words,
        "rule_bullet_lines": (F.lit(10) * n_bullet_lines) <= F.lit(9) * n_lines,
        "rule_ellipsis_lines": (F.lit(10) * n_ellipsis_lines) <= F.lit(3) * n_lines,
        "rule_alpha_words": (F.lit(5) * n_alpha_words) >= F.lit(4) * n_words,
        "rule_stopwords": n_stopwords_present >= min_stopwords,
    }
    verdict = None
    for c in rules.values():
        verdict = c if verdict is None else (verdict & c)
    counts = {
        "n_words": n_words,
        "n_word_chars": n_word_chars,
        "n_symbols": n_symbols,
        "n_alpha_words": n_alpha_words,
        "n_stopwords_present": n_stopwords_present,
    }
    return counts, rules, verdict


_WINNOW_POS_BITS = 20  # max 2^20-1 k-gram positions per doc


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 -- the MOSS algorithm): from every window of ``w``
    consecutive k-gram hashes, select the minimum (RIGHTMOST position
    on ties), then dedupe the selections. Guarantees: any substring
    match of length >= w + k - 1 between two documents shares at least
    one fingerprint, and no match shorter than k is ever detected --
    the position-robust local fingerprinting that gram-set methods
    (minhash, n-gram Jaccard) lack, and the primitive plagiarism /
    clone detection builds on.

    Output: (id, fp_pos, fp_hash) -- fp_pos is the 1-based position of
    the selected k-gram in the NORMALIZED text (lowercased, all
    non-alphanumerics stripped, MOSS-style, so whitespace/punctuation
    edits cannot shift fingerprints).

    Shape: one explode to (id, pos, hash) rows -- fanned out across
    cores first, the gram-family precedent -- then ONE window pass.
    The min-with-rightmost-tie selection collapses to a single MIN via
    an exact integer packing: key = hash * 2^20 + (2^20 - 1 - pos), so
    MIN(key) orders by hash then by DESCENDING position; hash is 32
    bits and pos < 2^20 (guarded with raise_error), so the packed key
    stays under 2^52 -- exact in any engine, which makes the whole
    operator SQL-expressible for a DuckDB oracle. Per-doc window state
    is w rows; no shuffle beyond the doc repartition + the window's
    partitionBy(id)."""
    if w < 1 or k < 1:
        raise ValueError("winnow_fingerprints needs k >= 1 and w >= 1")
    from pyspark.sql import Window

    par = df.sparkSession.sparkContext.defaultParallelism
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    base = (
        df.repartition(par, id_col)
        .select(F.col(id_col), norm.alias("__n"))
        .filter(F.length("__n") >= k)
        .select(
            F.col(id_col),
            F.col("__n"),
            (F.length("__n") - F.lit(k - 1)).alias("__ng"),
        )
    )
    cap = F.lit((1 << _WINNOW_POS_BITS) - 1)
    base = base.withColumn(
        "__ng",
        F.when(F.col("__ng") < cap, F.col("__ng")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("winnow_fingerprints: doc "),
                    F.col(id_col).cast("string"),
                    F.lit(" exceeds 2^20-1 k-gram positions; chunk it first"),
                )
            )
        ),
    )
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("__ng")),
                lambda i: F.substring(F.col("__n"), i, k),
            )
        ).alias("__p0", "__g"),
    ).select(
        F.col(id_col),
        (F.col("__p0") + 1).alias("pos"),
        F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    shift = F.lit(1 << _WINNOW_POS_BITS)
    keyed = grams.select(
        F.col(id_col),
        "pos",
        (F.col("h") * shift + (shift - 1 - F.col("pos"))).alias("__key"),
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    selected = (
        keyed.withColumn("__mk", F.min("__key").over(win))
        .withColumn("__wn", F.count(F.lit(1)).over(win))
        # only FULL windows select (rows near the end have truncated
        # frames; their grams are still selectable by earlier windows)
        .filter(F.col("__wn") == w)
        .select(
            F.col(id_col),
            (F.col("__mk") % shift).alias("__r"),
            (F.col("__mk") / shift).cast("bigint").alias("fp_hash"),
        )
        .select(
            F.col(id_col),
            (shift - 1 - F.col("__r")).cast("bigint").alias("fp_pos"),
            "fp_hash",
        )
        .distinct()
    )
    return selected


def winnow_overlap_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` winnowing fingerprints:
    (id_a, id_b, shared_fps). The matching side of MOSS -- a shared
    fingerprint witnesses a common substring of length >= k; requiring
    several filters random 32-bit collisions out.

    Shape: groupBy(fp_hash) bucket join, hot buckets capped at
    ``max_bucket_size`` ids (boilerplate fingerprints), pair counts
    map-side combined -- the LSH-bucket discipline applied to
    fingerprint buckets."""
    from pyspark.sql import Window

    # Pin the fingerprint lineage (r16, guide section 2.4): both sides
    # of the bucket self-join below derive from it, and exchange reuse
    # does not fire across them (the fingerprint window's lambda
    # defeats plan canonicalization), so the unpinned plan ran the
    # tokenize + k-gram hash + winnowing window TWICE per action. The
    # pin sits UNDER the distinct + hot-bucket cap (which stay cheap
    # and visible to the plan-shape guard) rather than over them.
    fps = fps.select(id_col, "fp_hash").localCheckpoint(eager=False)
    w = Window.partitionBy("fp_hash").orderBy(id_col)
    capped = (
        fps.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_bucket_size)
        .drop("__rn")
    )
    a = capped.select(F.col(id_col).alias("id_a"), "fp_hash")
    b = capped.select(F.col(id_col).alias("id_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def winnow_near_dup_pairs(
    docs: DataFrame,
    k: int = 16,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 2,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Winnowing as a first-class near-dup citizen (r10 VERDICT #6):
    candidate pairs from shared MOSS fingerprints, VERIFIED by exact
    k-shingle Jaccard -- the same candidates -> verifier -> (caller's)
    connected-components composition the MinHash and SimHash families
    use, with winnowing supplying the candidate stage. Output:
    (id_a, id_b, shared_fps, jaccard); feed to
    ``dedup.connected_components`` for clusters exactly like
    ``minhash_lsh_candidates`` output.

    Why this candidate stage exists alongside LSH: a shared
    fingerprint WITNESSES a common substring of length >= k (the
    winnowing guarantee is position-local), so candidates are
    order-preserving plagiarism/clone-style overlaps -- boilerplate
    with a paragraph lifted verbatim -- where gram-SET methods dilute
    the signal across the whole document. ``min_shared`` and the
    fingerprint geometry are the candidate precision knobs, measured
    on realistic prose in SCALE.md round 11: at the k=16/w=8 defaults
    every candidate pair shared a REAL substring (precision 1.0 at
    min_shared 1-3 on the probe fixture) and the near-dup verdicts
    were exact at every sweep point; k=8 grams (~1.5 words
    normalized) are common English and need min_shared >= 5 for the
    same candidate exactness. Raising min_shared past ~4 starts
    dropping SHORT shared substrings (one-sentence boilerplate
    footers) from the candidate set -- fine for the whole-document
    verdict, wrong if the caller wants overlap witnesses.

    Scale shape: fingerprint explode (doc-local window) -> the
    hot-bucket-capped bucket join of ``winnow_overlap_pairs`` ->
    a candidates-only join against the shingle arrays (two hash joins
    on id; candidate-bounded, never corpus x corpus)."""
    from .dedup import shingles_of

    fps = winnow_fingerprints(docs, k=k, w=w, text_col=text_col, id_col=id_col)
    cand = winnow_overlap_pairs(
        fps, id_col=id_col, min_shared=min_shared,
        max_bucket_size=max_bucket_size,
    )
    sh = (
        docs.select(
            F.col(id_col),
            F.regexp_replace(
                F.lower(F.col(text_col)), r"\s+", " "
            ).alias("__norm"),
        )
        .select(F.col(id_col), shingles_of(F.col("__norm"), shingle_k).alias("sh"))
        .localCheckpoint(eager=False)  # read by both sides of the pair join
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_fps",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
