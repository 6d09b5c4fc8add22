"""Round-9 session operators: source overlap matrix, corpus data card,
tokenizer stats, quality-curriculum sampling, streaming drift monitor."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.functions.corpus import source_overlap_matrix
from pg_auto_dw_spark.functions.datacard import corpus_datacard
from pg_auto_dw_spark.functions.sampling import (
    MODULUS,
    quality_bin,
    quality_binned_sample,
    sample_rank,
)
from pg_auto_dw_spark.functions.tokenizer import tokenizer_stats
from pg_auto_dw_spark.sources import load_table


def test_source_overlap_matrix_hand_example(spark):
    # 4-token grams; A and B share exactly one gram, C shares none
    mk = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, f"{mk} epsilon", "A"),          # grams: [a b g d], [b g d e]
            (2, f"{mk} zeta", "B"),             # grams: [a b g d], [b g d z]
            (3, "one two three four five", "C"),
        ],
        "doc_id bigint, text string, source string",
    )
    m = source_overlap_matrix(docs, n=4)
    got = {(r["src_a"], r["src_b"]): r for r in m.collect()}
    assert got[("A", "A")]["shared_grams"] == 2
    assert got[("B", "B")]["shared_grams"] == 2
    assert got[("C", "C")]["shared_grams"] == 2
    assert got[("A", "B")]["shared_grams"] == 1
    assert got[("B", "A")]["shared_grams"] == 1
    assert ("A", "C") not in got  # zero overlap emits no row
    assert got[("A", "B")]["grams_a"] == 2 and got[("A", "B")]["grams_b"] == 2
    assert got[("A", "B")]["containment_e6"] == 500000
    assert got[("A", "A")]["containment_e6"] == 1000000


def test_source_overlap_matrix_stop_gram_cap(spark):
    # a gram in every source is boilerplate: with cap=2 it must not
    # contribute to any pair (3 sources > cap)
    boiler = "the same exact boiler plate"
    docs = spark.createDataFrame(
        [(i, boiler, s) for i, s in enumerate(["A", "B", "C"])],
        "doc_id bigint, text string, source string",
    )
    assert source_overlap_matrix(docs, n=5, max_sources_per_gram=2).count() == 0
    full = source_overlap_matrix(docs, n=5, max_sources_per_gram=3)
    assert full.count() == 9  # full 3x3 matrix


def test_source_overlap_matrix_sf(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m = source_overlap_matrix(docs).collect()
    srcs = {r["src_a"] for r in m}
    assert len(srcs) >= 2
    for r in m:
        assert 0 <= r["shared_grams"] <= r["grams_a"]
        if r["src_a"] == r["src_b"]:
            assert r["containment_e6"] == 1000000


def test_corpus_datacard(spark):
    long_ok = " ".join(["the be to of and that have with word"] * 8)  # 72 words
    docs = spark.createDataFrame(
        [
            (1, long_ok, "web", "en"),
            (2, long_ok, "web", "en"),          # exact dup of 1
            (3, "short text", "web", "en"),     # short
            (4, None, "web", "en"),             # empty
            (5, long_ok + " extra", "books", "en"),
        ],
        "doc_id bigint, text string, source string, lang string",
    )
    card = {(r["source"], r["lang"]): r for r in corpus_datacard(docs).collect()}
    web = card[("web", "en")]
    assert web["n_docs"] == 4
    assert web["n_empty"] == 1
    assert web["n_distinct_texts"] == 2
    assert web["n_exact_dups"] == 1
    assert web["n_short"] == 1
    assert web["n_gopher_pass"] == 2  # the two long dups pass the rules
    assert web["total_words"] == 72 + 72 + 2
    books = card[("books", "en")]
    assert books["n_docs"] == 1 and books["n_exact_dups"] == 0
    assert books["min_chars"] == books["max_chars"] == len(long_ok) + 6


def test_tokenizer_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat", "A"),    # words 2; bpe: th,e,</w> + c,a,t,</w> = 7
            (2, "an ant", "A"),     # words 2; an,</w> + an,t,</w> = 5
            (3, "zz", "B"),         # words 1; z,z,</w> = 3
        ],
        "doc_id bigint, text string, source string",
    )
    merges = [("t", "h"), ("a", "n")]
    got = {r["source"]: r for r in tokenizer_stats(docs, merges).collect()}
    a = got["A"]
    assert (a["n_docs"], a["total_words"], a["total_bpe_tokens"]) == (2, 4, 12)
    assert a["total_chars"] == 7 + 6
    assert a["tokens_per_100_words"] == 300  # 1200 div 4
    assert a["chars_per_100_tokens"] == 108  # 1300 div 12
    b = got["B"]
    assert (b["total_words"], b["total_bpe_tokens"]) == (1, 3)


def test_quality_bin_and_binned_sample(spark):
    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)],
        "doc_id bigint, score double",
    ).union(spark.createDataFrame([(9999, None)], "doc_id bigint, score double"))
    bins = df.filter(F.col("score").isNotNull()).select(
        "score", quality_bin(F.col("score"), [3.0, 7.0]).alias("b")
    )
    for r in bins.collect():
        expect = 0 if r["score"] < 3 else (1 if r["score"] < 7 else 2)
        assert r["b"] == expect
    out = quality_binned_sample(df, "doc_id", "score", [3.0, 7.0], [0.0, 0.5, 1.0])
    rows = out.collect()
    assert all(r["score"] is not None for r in rows)          # NULL dropped
    assert all(r["score"] >= 3.0 for r in rows)               # bin 0 rate 0
    top = [r for r in rows if r["score"] >= 7.0]
    assert len(top) == 300                                     # bin 2 kept fully
    mid = [r for r in rows if 3.0 <= r["score"] < 7.0]
    assert 120 <= len(mid) <= 280                              # ~half of 400
    # deterministic: re-run selects identical rows
    again = {r["doc_id"] for r in quality_binned_sample(
        df, "doc_id", "score", [3.0, 7.0], [0.0, 0.5, 1.0]).collect()}
    assert again == {r["doc_id"] for r in rows}
    # keep decision matches the rank math exactly
    for r in rows:
        rk = (r["doc_id"] * 2654435761) % MODULUS
        rate = 0.5 if r["score"] < 7.0 else 1.0
        assert rk < int(rate * MODULUS)
    with pytest.raises(ValueError, match="rates"):
        quality_binned_sample(df, "doc_id", "score", [3.0], [1.0, 1.0, 1.0])
    with pytest.raises(ValueError, match="ascending"):
        quality_bin(F.col("score"), [7.0, 3.0])


def test_write_curriculum_shards(spark, tmp_path):
    from pg_auto_dw_spark.functions.shard import read_shard, write_curriculum_shards

    docs = spark.createDataFrame(
        [(i, f"text {i}", float(i % 5)) for i in range(200)],
        "doc_id bigint, text string, score double",
    )
    path = str(tmp_path / "cur")
    write_curriculum_shards(docs, path, n_shards=4, order_col="score")
    total = 0
    for s in range(4):
        rows = read_shard(spark, path, s).collect()
        total += len(rows)
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)  # curriculum order
    assert total == 200


def test_drift_monitor_stream(spark, tmp_path):
    from pg_auto_dw_spark.streaming.jobs import drift_monitor_stream
    from pg_auto_dw_spark.warehouse import Warehouse

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("quality", T.DoubleType()),
         T.StructField("source", T.StringType())]
    )
    reference = spark.createDataFrame(
        [(i, float(i % 100) / 10.0, "web") for i in range(1000)], schema
    )
    src = tmp_path / "incoming"
    # batch with the SAME distribution -> tiny PSI
    same = spark.createDataFrame(
        [(10_000 + i, float(i % 100) / 10.0, "web") for i in range(500)], schema
    )
    same.write.parquet(str(src), mode="overwrite")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = drift_monitor_stream(
        spark, str(src), schema, wh, "monitor.drift", reference,
        keys=["source"], col="quality", lo=0.0, hi=10.0, n_buckets=10,
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    rows = wh.read("monitor.drift").collect()
    assert len(rows) == 1 and rows[0]["psi"] < 0.05 and rows[0]["n_new"] == 500
    # a SHIFTED batch arrives -> PSI flags it
    shifted = spark.createDataFrame(
        [(20_000 + i, 9.0 + float(i % 10) / 10.0, "web") for i in range(500)], schema
    )
    shifted.write.parquet(str(src), mode="append")
    q = drift_monitor_stream(
        spark, str(src), schema, wh, "monitor.drift", reference,
        keys=["source"], col="quality", lo=0.0, hi=10.0, n_buckets=10,
        checkpoint_dir=str(tmp_path / "ckpt1"),  # same checkpoint: only the new file
    )
    q.awaitTermination(120)
    rows = sorted(wh.read("monitor.drift").collect(), key=lambda r: r["batch_id"])
    assert len(rows) == 2
    assert rows[-1]["psi"] > 0.25  # shifted distribution flagged


def test_dedup_ingest_ledger_across_batches(spark, tmp_path):
    from pg_auto_dw_spark.streaming.jobs import dedup_ingest_apply
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, None)],
        "doc_id bigint, text string",
    )
    s1 = dedup_ingest_apply(wh, "c.docs", "c.digests", b1)
    assert s1 == {"ingested": 3, "dup_within_batch": 1, "dup_vs_ledger": 0}
    # batch 2: one re-submission of "beta", one new, one NULL
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, None)],
        "doc_id bigint, text string",
    )
    s2 = dedup_ingest_apply(wh, "c.docs", "c.digests", b2)
    assert s2 == {"ingested": 2, "dup_within_batch": 0, "dup_vs_ledger": 1}
    docs = wh.read("c.docs")
    assert docs.count() == 5  # 1,2,4 + 11,12 (alpha dup + beta resubmit dropped)
    texts = sorted(r["text"] for r in docs.collect() if r["text"] is not None)
    assert texts == ["alpha", "beta", "gamma"]
    assert wh.read("c.digests").count() == 3


def test_jsonl_dedup_ingest_stream_end_to_end(spark, tmp_path):
    from pyspark.sql import types as T

    from pg_auto_dw_spark.streaming.jobs import jsonl_dedup_ingest_stream
    from pg_auto_dw_spark.warehouse import Warehouse

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        '{"doc_id": 2, "text": "beta"}\n'
        "this is not json\n"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run():
        q = jsonl_dedup_ingest_stream(
            spark, str(src), schema, wh, "lz.docs", "lz.quarantine",
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run()
    assert wh.read("lz.docs").count() == 2
    assert wh.read("lz.quarantine").count() == 1
    # second file re-submits alpha, adds one new doc
    (src / "b.jsonl").write_text(
        '{"doc_id": 9, "text": "alpha"}\n'
        '{"doc_id": 10, "text": "delta"}\n'
    )
    run()
    docs = wh.read("lz.docs").collect()
    assert sorted(r["text"] for r in docs) == ["alpha", "beta", "delta"]
    assert {r["doc_id"] for r in docs} == {1, 2, 10}  # resubmission dropped
    # restart over the same sources: exact no-op
    run()
    assert wh.read("lz.docs").count() == 3
    assert wh.read("lz.quarantine").count() == 1
