"""The one-call corpus pipeline facade: stage composition + contracts."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.pipeline import CorpusPipelineConfig, build_training_corpus
from pg_auto_dw_spark.sources import load_table


def test_pipeline_default_stages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(300)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    res = build_training_corpus(docs, benchmark=bench)
    names = [n for n, _ in res.stages]
    assert names == [
        "input", "gopher_rules", "exact_dedup", "bloom_decontaminate", "sharded"
    ]
    summary = dict(res.summary())
    assert summary["input"] == 300
    # monotone shrink through the filters
    assert (
        summary["input"]
        >= summary["gopher_rules"]
        >= summary["exact_dedup"]
        >= summary["bloom_decontaminate"]
        == summary["sharded"]
    )
    # every survivor has a token count, a placement row, and a shard
    n = summary["bloom_decontaminate"]
    assert res.token_counts.count() == n
    assert res.placement.count() == n
    assert res.sharded.select("shard").distinct().count() <= 64
    # id spaces align across outputs
    ids = {r["doc_id"] for r in res.survivors.select("doc_id").collect()}
    assert {r["doc_id"] for r in res.placement.select("doc_id").collect()} == ids


def test_pipeline_optional_stages_off(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    cfg = CorpusPipelineConfig(min_words=None, exact_dedup=False, n_shards=4)
    res = build_training_corpus(docs, config=cfg)
    assert [n for n, _ in res.stages] == ["input", "sharded"]
    assert res.survivors.count() == 100


def test_pipeline_mixture_and_exact_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    cfg = CorpusPipelineConfig(
        min_words=None,
        exact_dedup=False,
        strata_col="source",
        budget_rows=80,
        exact_tokens=True,
        bpe_merges=50,
        n_shards=4,
    )
    res = build_training_corpus(docs, config=cfg)
    kept = res.survivors.count()
    assert 0 < kept <= 80
    counts = res.token_counts.collect()
    assert len(counts) == kept
    assert all(r["n_bpe_tokens"] > 0 for r in counts)


def test_persist_survivors_pins_and_releases(spark, sf_dir):
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.pipeline import (
        CorpusPipelineConfig,
        build_training_corpus,
    )
    from pg_auto_dw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    off = build_training_corpus(docs, benchmark=bench)
    assert off.pinned is None
    off.release()  # no-op by contract
    cfg = CorpusPipelineConfig(persist_survivors=True)
    on = build_training_corpus(docs, benchmark=bench, config=cfg)
    assert on.pinned is not None and on.pinned.storageLevel.useMemory
    # identical results either way
    assert on.sharded.count() == off.sharded.count()
    assert on.summary() == off.summary()
    on.release()
    assert not on.pinned.storageLevel.useMemory  # storage released


def test_manifest_is_json_serializable_reproducibility_record(spark, sf_dir):
    import json

    from pg_auto_dw_spark.pipeline import (
        CorpusPipelineConfig,
        build_training_corpus,
    )
    from pg_auto_dw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    cfg = CorpusPipelineConfig(min_words=10, n_shards=8, seed=3)
    res = build_training_corpus(docs, config=cfg)
    summ = res.summary()
    m = res.manifest(summary=summ)  # reuse counts, no recount
    blob = json.dumps(m)  # must be JSON-serializable as-is
    back = json.loads(blob)
    assert back["config"]["n_shards"] == 8 and back["config"]["seed"] == 3
    assert back["config"]["min_words"] == 10
    assert back["stages"][0] == ["input", docs.count()]
    assert [tuple(s) for s in back["stages"]] == summ
