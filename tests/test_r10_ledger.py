"""Round-10 directive 1: digest-ledger dedup reshaped so the ledger
never shuffles, plus the bloom front filter that skips even the
ledger scan for mostly-new batches."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_auto_dw_spark.functions.corpus import bloom_build_keys, with_key_bloom_hit
from pg_auto_dw_spark.streaming.jobs import dedup_ingest_apply
from pg_auto_dw_spark.warehouse import Warehouse


def test_bloom_build_keys_no_false_negatives(spark):
    keys = spark.createDataFrame(
        [(f"digest-{i}",) for i in range(500)], "k string"
    )
    bloom = bloom_build_keys(keys, "k", m_bits=1 << 14)
    head = bloom.first()
    assert head["n_grams"] == 500 and head["n"] == 0
    flagged = with_key_bloom_hit(keys, bloom, "k")
    # every built key must hit (the contract dedup correctness rests on)
    assert flagged.filter(~F.col("bloom_hit")).count() == 0
    # fresh keys mostly miss (fp rate, not correctness -- bound loosely)
    fresh = spark.createDataFrame(
        [(f"other-{i}",) for i in range(500)], "k string"
    )
    fp = with_key_bloom_hit(fresh, bloom, "k").filter(F.col("bloom_hit")).count()
    assert fp < 50


def test_bloom_build_keys_empty_input(spark):
    empty = spark.createDataFrame([], "k string")
    bloom = bloom_build_keys(empty, "k", m_bits=1 << 10)
    head = bloom.first()
    assert head["n_grams"] == 0
    probe = spark.createDataFrame([("x",)], "k string")
    assert with_key_bloom_hit(probe, bloom, "k").first()["bloom_hit"] is False


def test_bloom_build_keys_rejects_bad_m(spark):
    keys = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="power of two"):
        bloom_build_keys(keys, "k", m_bits=1000)


def test_dedup_ingest_apply_with_bloom_accounting(spark, tmp_path):
    """Same accounting as the unfrontend apply, with the bloom deciding
    which rows ever touch the ledger."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, None)],
        "doc_id bigint, text string",
    )
    # batch 1: empty ledger -> empty bloom -> zero possible-dups, the
    # ledger is never scanned and everything canonical is ingested
    empty_bloom = bloom_build_keys(
        spark.createDataFrame([], "digest string"), "digest", m_bits=1 << 12
    )
    s1 = dedup_ingest_apply(
        wh, "c.docs", "c.digests", b1, ledger_bloom=empty_bloom
    )
    assert s1 == {"ingested": 3, "dup_within_batch": 1, "dup_vs_ledger": 0}
    # batch 2 probes a bloom rebuilt from the ledger
    bloom = bloom_build_keys(wh.read("c.digests").select("digest"), "digest",
                             m_bits=1 << 12)
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, None)],
        "doc_id bigint, text string",
    )
    s2 = dedup_ingest_apply(wh, "c.docs", "c.digests", b2, ledger_bloom=bloom)
    assert s2 == {"ingested": 2, "dup_within_batch": 0, "dup_vs_ledger": 1}
    texts = sorted(
        r["text"] for r in wh.read("c.docs").collect() if r["text"] is not None
    )
    assert texts == ["alpha", "beta", "gamma"]
    assert wh.read("c.digests").count() == 3


def test_jsonl_dedup_stream_with_maintained_bloom(spark, tmp_path):
    """The streaming landing zone with the maintained bloom must give
    byte-identical dedup verdicts to the unfrontend path -- across
    batches AND across a restart (bloom rebuilt from the ledger)."""
    from pg_auto_dw_spark.streaming.jobs import jsonl_dedup_ingest_stream

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        '{"doc_id": 2, "text": "beta"}\n'
        "not json at all\n"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run():
        q = jsonl_dedup_ingest_stream(
            spark, str(src), schema, wh, "lz.docs", "lz.quarantine",
            str(tmp_path / "ckpt"), ledger_bloom_m_bits=1 << 12,
        )
        q.awaitTermination(120)

    run()
    assert wh.read("lz.docs").count() == 2
    assert wh.read("lz.quarantine").count() == 1
    # second feed within a NEW stream instance (restart: bloom is
    # rebuilt from the persisted ledger): resubmits alpha, adds delta
    (src / "b.jsonl").write_text(
        '{"doc_id": 9, "text": "alpha"}\n'
        '{"doc_id": 10, "text": "delta"}\n'
    )
    run()
    docs = wh.read("lz.docs").collect()
    assert sorted(r["text"] for r in docs) == ["alpha", "beta", "delta"]
    assert {r["doc_id"] for r in docs} == {1, 2, 10}
    # replay the same checkpoint: exact no-op
    run()
    assert wh.read("lz.docs").count() == 3


def test_landing_zone_maintenance_loop(spark, tmp_path):
    """r9 VERDICT directive 7: the REAL maintenance loop, composed --
    N micro-batches accrete one-file-per-batch small-file pressure on
    the landing tables, the wired-in maybe_compact trigger fires on
    cadence, and the post-compaction table reads identically with a
    collapsed file count."""
    from pyspark.sql import types as T

    from pg_auto_dw_spark.streaming.jobs import jsonl_dedup_ingest_stream

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run_batch(i: int):
        (src / f"b{i:03d}.jsonl").write_text(
            f'{{"doc_id": {i}, "text": "unique document number {i}"}}\n'
        )
        q = jsonl_dedup_ingest_stream(
            spark, str(src), schema, wh, "lz.docs", "lz.quarantine",
            str(tmp_path / "ckpt"),
            # every=1 because each run_batch builds a FRESH stream (the
            # cadence counter lives in the stream closure); the
            # threshold still gates the rewrite, so most batches are
            # probe-only noops
            maintenance_every=1,
            # every parquet this test writes is tiny, so ANY file
            # counts as small; trigger once more than 3 accrete
            maintenance_kwargs={"max_small_files": 3, "small_file_mb": 1},
        )
        q.awaitTermination(120)

    n_batches = 10
    for i in range(n_batches):
        run_batch(i)

    docs = wh.read("lz.docs")
    # read equivalence: every unique doc, exactly once
    assert sorted(r["doc_id"] for r in docs.collect()) == list(range(n_batches))
    # the trigger actually fired: appends alone never overwrite
    actions = [h["action"] for h in wh.history("lz.docs")]
    assert "overwrite" in actions
    # file pressure collapsed: strictly fewer live files than batches
    health = wh.table_health("lz.docs", small_file_mb=1)
    assert health["files"] < n_batches
    # the digest ledger rides the same cadence
    ledger_health = wh.table_health("lz.docs.digests", small_file_mb=1)
    assert ledger_health["files"] < n_batches
    assert wh.read("lz.docs.digests").count() == n_batches
