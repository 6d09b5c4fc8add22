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


def test_quality_classifier_stage_gates_and_manifests(spark):
    """r12: the trained-classifier gate in the batch facade -- train on
    a separable good/junk fixture (the streaming-gate twin), gate the
    pipeline, and exactly the good docs survive; a zero-token doc
    fails closed; the manifest stays JSON-serializable with the
    weights frame reduced to a type marker (the model is an artifact,
    not a knob)."""
    import json

    from pg_auto_dw_spark.functions.selection import train_linear_classifier

    good = ("the quick study found that careful analysis gives better "
            "results and the method works well with clear data")
    junk = ("zzqx vvkp wwrt qqpl mmnb the of ffgh ddjk ssle hhwo rrty "
            "uuie ppas oolk iijh and ggfd")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    weights, _ = train_linear_classifier(
        mk([(i, good + f" v{i % 3}") for i in range(12)]),
        mk([(i, junk + f" n{i % 3}") for i in range(12)]),
        iters=6,
    )
    docs = mk(
        [(1, good), (2, good + " more"), (3, junk), (4, junk + " xx"), (5, "")]
    )
    gated = build_training_corpus(
        docs,
        config=CorpusPipelineConfig(
            min_words=None, exact_dedup=False,
            quality_weights=weights.localCheckpoint(),
            min_quality_score=0.0,
        ),
    )
    assert "quality_classifier" in [n for n, _ in gated.stages]
    assert {r["doc_id"] for r in gated.survivors.select("doc_id").collect()} == {1, 2}
    m = gated.manifest(summary=[("input", 1)])
    assert m["config"]["quality_weights"] == "<DataFrame>"
    json.dumps(m)  # must stay serializable with a model in the config


def test_quality_keep_fraction_rate_gate(spark):
    """r12: the rate form of the classifier gate -- keep the top
    fraction BY SCORE (the knob that transfers across corpora, since
    the bias-free ranker has no universal absolute operating point).
    On a separable fixture, keep-half = exactly the good half
    (identical junk scores tie AT the cutoff and the strictly-above
    rule drops them all); the cutoff is a lazy broadcast percentile
    aggregate, never a global sort or a build-time driver action."""
    import pytest

    from pg_auto_dw_spark.functions.selection import train_linear_classifier

    good = ("the quick study found that careful analysis gives better "
            "results and the method works well with clear data")
    junk = ("zzqx vvkp wwrt qqpl mmnb the of ffgh ddjk ssle hhwo rrty "
            "uuie ppas oolk iijh and ggfd")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    weights, _ = train_linear_classifier(
        mk([(i, good + f" v{i % 3}") for i in range(12)]),
        mk([(i, junk + f" n{i % 3}") for i in range(12)]),
        iters=6,
    )
    docs = mk([(1, good), (2, good + " more"), (3, junk), (4, junk)])
    res = build_training_corpus(
        docs,
        config=CorpusPipelineConfig(
            min_words=None, exact_dedup=False,
            quality_weights=weights.localCheckpoint(),
            quality_keep_fraction=0.5,
        ),
    )
    assert {r["doc_id"] for r in res.survivors.select("doc_id").collect()} == {1, 2}
    with pytest.raises(ValueError, match="quality_keep_fraction"):
        build_training_corpus(
            docs,
            config=CorpusPipelineConfig(
                min_words=None, exact_dedup=False,
                quality_weights=weights, quality_keep_fraction=1.5,
            ),
        )


def test_materialize_training_corpus_end_to_end(spark, sf_dir, tmp_path):
    """Pipeline -> warehouse loader contract in one call: totals agree
    with the pipeline's own placement, the reproducibility record
    lands as <name>.build, and the exact_tokens path refuses with the
    documented redirect."""
    import json

    import pytest

    from pg_auto_dw_spark.functions.corpus import read_packed_shard
    from pg_auto_dw_spark.pipeline import materialize_training_corpus
    from pg_auto_dw_spark.warehouse import Warehouse

    docs = load_table(spark, sf_dir, "documents").limit(200)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    res, totals = materialize_training_corpus(
        wh, "train", docs, seqs_per_shard=4,
        config=CorpusPipelineConfig(seq_tokens=256),
    )
    placed_total = res.placement.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert totals["tokens"] == placed_total
    assert wh.read("train.manifest").count() == totals["shards"]
    s0 = read_packed_shard(wh, "train", 0).collect()
    assert s0 and all(len(r["token_ids"]) == r["n_filled"] for r in s0)
    build = wh.read("train.build").collect()[0]
    rec = json.loads(build["build_manifest"])
    assert rec["config"]["seq_tokens"] == 256
    assert dict((s[0], s[1]) for s in rec["stages"])["input"] == 200
    assert build["n_tokens"] == totals["tokens"]
    with pytest.raises(ValueError, match="assemble_packed_sequences"):
        materialize_training_corpus(
            wh, "t2", docs, config=CorpusPipelineConfig(exact_tokens=True),
        )
