"""End-to-end training-corpus pipeline composition: the round-7
operators chained the way a real pretraining data build runs them --
clean -> quality band-pass (compressibility + LM scores) ->
decontaminate -> temperature mix -> repeat up-weight -> pack into
fixed-token sequences. The point under test is the COLUMN CONTRACTS:
every stage consumes exactly what the previous stage emits, no stage
re-reads the raw corpus after the filter chain starts, and the final
placement map is a valid packing of exactly the surviving docs."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.corpus import (
    clean_corpus,
    decontaminate,
    pack_sequences,
    packing_stats,
)
from pg_auto_dw_spark.functions.sampling import repeat_sample, temperature_sample
from pg_auto_dw_spark.functions.text import (
    compression_ratio,
    unigram_logprob,
)
from pg_auto_dw_spark.sources import load_table


def test_corpus_pipeline_composes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    # 1. clean: language/length/alpha/canonical-dedup survivors
    kept_ids = clean_corpus(docs).select("doc_id")
    kept = docs.join(kept_ids, "doc_id")
    n_clean = kept.count()
    assert 0 < n_clean <= docs.count()

    # 2. quality band-pass: drop the most compressible (template/spam)
    # tail and the lowest-LM-logprob (gibberish) tail
    z = compression_ratio(kept).select("doc_id", "compression_ratio")
    lm = unigram_logprob(kept).select("doc_id", "avg_logprob")
    scored = kept.join(z, "doc_id").join(lm, "doc_id")
    assert scored.count() == n_clean  # score stages are 1:1, never drop
    q = scored.filter(
        (F.col("compression_ratio") > 0.2) & (F.col("avg_logprob") > -6.0)
    )
    n_q = q.count()
    assert 0 < n_q <= n_clean

    # 3. decontaminate against a planted benchmark built FROM two docs
    bench_rows = q.orderBy("doc_id").limit(2).collect()
    benchmark = spark.createDataFrame(
        [(100_000 + r["doc_id"], r["text"]) for r in bench_rows],
        "doc_id long, text string",
    )
    dq = decontaminate(q, benchmark)
    contaminated = {r["doc_id"] for r in bench_rows}
    surviving = {r["doc_id"] for r in dq.select("doc_id").collect()}
    assert contaminated.isdisjoint(surviving)
    assert len(surviving) <= n_q

    # 4. temperature mix by source, then 2x up-weight the rarest source
    mixed = temperature_sample(dq, "doc_id", "source", 0.5, max(len(surviving) // 2, 1))
    n_mixed = mixed.count()
    assert 0 < n_mixed <= len(surviving)
    rare = (
        mixed.groupBy("source").count().orderBy("count", "source").first()["source"]
    )
    repeated = repeat_sample(mixed, "doc_id", {rare: 2.0}, "source")
    n_rare = mixed.filter(F.col("source") == rare).count()
    assert repeated.count() == n_mixed + n_rare
    # packing needs unique keys after repetition: synthesize one
    packable = repeated.withColumn(
        "pack_id", F.col("doc_id") * 10 + F.col("copy_id")
    )

    # 5. pack: the placement map covers exactly the surviving rows,
    # and the stats row accounts for every token
    placed = pack_sequences(packable, seq_tokens=512, id_col="pack_id")
    assert placed.count() == repeated.count()
    stats = packing_stats(packable, seq_tokens=512, id_col="pack_id").collect()[0]
    total = placed.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert stats["total_tokens"] == total
    assert stats["n_sequences"] == -(-total // 512)
    assert 0 < stats["last_seq_fill"] <= 512


def test_tokenize_budget_pack_shard_composition(spark, sf_dir, tmp_path):
    """The full batch-construction tail with the REAL tokenizer: train
    BPE on the corpus, score exact token counts, filter by gopher
    rules + bloom decontamination, pack the survivors, shard the
    epoch. Column contracts hold at every seam; nothing contaminated
    or rule-failing reaches a shard."""
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.corpus import (
        bloom_decontaminate,
        pack_sequences,
    )
    from pg_auto_dw_spark.functions.shard import shard_assignments
    from pg_auto_dw_spark.functions.text import gopher_rules
    from pg_auto_dw_spark.functions.tokenizer import bpe_apply, bpe_train
    from pg_auto_dw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(400)
    bench = docs.filter(F.col("doc_id") % 97 == 0)

    # 1. rule filter (codegen scan) -> keep passing docs
    verdicts = gopher_rules(docs, min_words=10, min_stopwords=1)
    kept_ids = verdicts.filter(F.col("gopher_pass")).select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi")

    # 2. decontaminate in place (zero-shuffle bloom)
    clean = bloom_decontaminate(kept, bench, m_bits=2**17)
    assert "bloom_hit" not in clean.columns  # verdict column consumed
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    # benchmark members with at least one 8-gram flag themselves out
    long_bench = {
        r["doc_id"]
        for r in bench.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("w")
        ).collect()
        if r["w"] >= 8
    }
    assert clean_ids.isdisjoint(long_bench)

    # 3. real tokenizer: exact counts for the packing step
    merges = bpe_train(clean, n_merges=120)
    counts = bpe_apply(clean, merges)
    assert counts.count() == len(clean_ids)

    # 4. pack the survivors (placement map over the SAME id space)
    packed = pack_sequences(clean, seq_tokens=512)
    placed = {r["doc_id"] for r in packed.select("doc_id").collect()}
    assert placed == clean_ids

    # 5. shard the epoch; every placed doc lands in exactly one shard
    sharded = shard_assignments(clean, n_shards=4, seed=3)
    assert sharded.count() == len(clean_ids)
    assert sharded.select("doc_id").distinct().count() == len(clean_ids)
