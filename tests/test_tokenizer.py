"""BPE tokenizer: training semantics, determinism, distributed apply."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.tokenizer import (
    END,
    bpe_apply,
    bpe_token_counts,
    bpe_train,
    bpe_vocab_table,
    word_frequencies,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_learns_expected_merges(spark):
    # 'aaab' x4: pair counts (a,a)=8, (a,b)=4, (b,</w>)=4
    docs = _docs(spark, ["aaab aaab", "aaab aaab"])
    merges = bpe_train(docs, n_merges=2)
    assert merges[0] == ("a", "a")
    # after merge 1 words are (aa, a, b, </w>): best next pair is
    # (aa, a) with count 4 (ties with (a,b),(b,</w>) broken lexically
    # -- '(a,b)' sorts before '(aa,a)'... comparison is on the tuple)
    assert merges[1] == (("a", "b") if ("a", "b") < ("aa", "a") else ("aa", "a"))


def test_bpe_roundtrip_segments_training_words(spark):
    docs = _docs(spark, ["hello hello world", "hello world world"])
    merges = bpe_train(docs, n_merges=50)
    out = bpe_apply(docs, merges, with_tokens=True).collect()
    by_id = {r["doc_id"]: r for r in out}
    # with enough merges every training word collapses to one token
    assert by_id[0]["n_bpe_tokens"] == 3
    assert by_id[0]["tokens"] == ["hello" + END, "hello" + END, "world" + END]


def test_bpe_train_deterministic_across_partitioning(spark):
    texts = [f"alpha beta gamma delta token{i % 7} stream spark" for i in range(40)]
    a = bpe_train(_docs(spark, texts).repartition(1), n_merges=30)
    b = bpe_train(_docs(spark, texts).repartition(13), n_merges=30)
    assert a == b


def test_bpe_apply_counts_unseen_words(spark):
    train = _docs(spark, ["spark spark spark batch batch"])
    merges = bpe_train(train, n_merges=100)
    # unseen word falls back toward characters: count is bounded by
    # len(word) + 1 sentinel and at least 1
    out = bpe_apply(_docs(spark, ["zzzq spark"]), merges).collect()[0]
    seen_cost = 1  # 'spark' fully merged
    assert 1 + seen_cost <= out["n_bpe_tokens"] <= len("zzzq") + 1 + seen_cost


def test_bpe_token_counts_beats_regex_proxy(spark, sf_dir):
    """On the real corpus the trained counts are finite, positive, and
    no larger than chars+words (the untrained ceiling)."""
    from pg_auto_dw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    out = bpe_token_counts(docs, n_merges=100)
    rows = out.collect()
    assert len(rows) == 100
    assert all(r["n_bpe_tokens"] > 0 for r in rows)
    stats = docs.select(
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("words"),
    ).collect()[0]
    assert sum(r["n_bpe_tokens"] for r in rows) <= stats["chars"] + stats["words"]


def test_bpe_vocab_table_shape(spark):
    merges = bpe_train(_docs(spark, ["aa aa aa"]), n_merges=5)
    vt = bpe_vocab_table(spark, merges).collect()
    assert [r["rank"] for r in vt] == list(range(len(merges)))
    assert all(r["merged"] == r["left"] + r["right"] for r in vt)


def test_word_frequencies_bounded_and_ordered(spark):
    docs = _docs(spark, ["a a a b b c"])
    wf = word_frequencies(docs, max_vocab_words=2)
    assert wf == [("a", 3), ("b", 2)]
