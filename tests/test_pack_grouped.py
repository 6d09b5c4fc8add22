"""Group-contiguous packing (functions/corpus.py
pack_grouped_sequences): same placement contract as pack_sequences,
group-major deterministic order. Pins the contiguity invariant (a
group's docs occupy ONE unbroken global token range), the
hole/overlap-free packing, NULL-group singletons, epoch-salt
reshuffle (order moves, membership and widths don't), and
composition with packed_shard_manifest."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.corpus import (
    pack_grouped_sequences,
    packed_shard_manifest,
)


def _docs(spark, n=60):
    rows = [
        (i, f"src_{i % 7}" if i % 13 != 0 else None,
         ("lorem ipsum dolor sit " * (1 + i % 6)).strip())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def _check_valid_packing(rows):
    """Offsets must tile [0, total) with no hole or overlap."""
    rows = sorted(rows, key=lambda r: r["global_offset"])
    pos = 0
    for r in rows:
        assert r["global_offset"] == pos, (r["doc_id"], r["global_offset"], pos)
        pos += r["n_bpe_tokens"]
    return pos


def test_groups_are_contiguous_and_packing_is_tight(spark):
    docs = _docs(spark)
    out = pack_grouped_sequences(docs, "source", seq_tokens=64).collect()
    assert len(out) == 60
    total = _check_valid_packing(out)
    assert total == sum(r["n_bpe_tokens"] for r in out)
    src = {r["doc_id"]: (r["doc_id"] % 7 if r["doc_id"] % 13 != 0 else None)
           for r in out}
    by_group = {}
    for r in out:
        by_group.setdefault(src[r["doc_id"]], []).append(r)
    for gid, rs in by_group.items():
        if gid is None:
            continue
        lo = min(r["global_offset"] for r in rs)
        hi = max(r["global_offset"] + r["n_bpe_tokens"] for r in rs)
        width = sum(r["n_bpe_tokens"] for r in rs)
        assert hi - lo == width, f"group {gid} not contiguous"
    # seq coords consistent with offsets
    for r in out:
        assert r["seq_id"] == r["global_offset"] // 64
        assert r["seq_offset"] == r["global_offset"] % 64


def test_null_groups_pack_alone_and_salt_reshuffles(spark):
    docs = _docs(spark)
    a = pack_grouped_sequences(docs, "source", seq_tokens=64).collect()
    b = pack_grouped_sequences(docs, "source", seq_tokens=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    c = pack_grouped_sequences(
        docs, "source", seq_tokens=64, epoch_salt="e1"
    ).collect()
    # same widths per doc, different order somewhere
    wa = {r["doc_id"]: r["n_bpe_tokens"] for r in a}
    wc = {r["doc_id"]: r["n_bpe_tokens"] for r in c}
    assert wa == wc
    assert {r["doc_id"]: r["global_offset"] for r in a} != {
        r["doc_id"]: r["global_offset"] for r in c
    }
    _check_valid_packing(c)
    # salted layout is STILL group-contiguous
    src = {r["doc_id"]: (r["doc_id"] % 7 if r["doc_id"] % 13 != 0 else None)
           for r in c}
    by_group = {}
    for r in c:
        by_group.setdefault(src[r["doc_id"]], []).append(r)
    for gid, rs in by_group.items():
        if gid is None:
            continue
        lo = min(r["global_offset"] for r in rs)
        hi = max(r["global_offset"] + r["n_bpe_tokens"] for r in rs)
        assert hi - lo == sum(r["n_bpe_tokens"] for r in rs)


def test_composes_with_shard_manifest(spark):
    docs = _docs(spark)
    placed = pack_grouped_sequences(docs, "source", seq_tokens=64)
    man = packed_shard_manifest(placed, seq_tokens=64, seqs_per_shard=2)
    total = placed.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    rows = man.collect()
    assert sum(r["n_tokens"] for r in rows) == total
    for r in sorted(rows, key=lambda r: r["shard_id"])[:-1]:
        assert r["n_tokens"] == 128


def test_adversarial_group_value_never_merges_with_null_singleton(spark):
    """A real group whose string value mimics the NULL-singleton
    namespace ('n <id>') must stay its own group: prefixes keep the
    namespaces disjoint (r15 review)."""
    docs = spark.createDataFrame(
        [(1, "n 3", "alpha beta gamma delta epsilon"),
         (2, "n 3", "zeta eta theta iota kappa"),
         (3, None, "lambda mu nu xi omicron")],
        "doc_id bigint, source string, text string",
    )
    out = pack_grouped_sequences(docs, "source", seq_tokens=64).collect()
    _check_valid_packing(out)
    g = {r["doc_id"]: r for r in out}
    # docs 1 and 2 are adjacent (one contiguous range)
    lo = min(g[1]["global_offset"], g[2]["global_offset"])
    hi = max(g[1]["global_offset"] + g[1]["n_bpe_tokens"],
             g[2]["global_offset"] + g[2]["n_bpe_tokens"])
    assert hi - lo == g[1]["n_bpe_tokens"] + g[2]["n_bpe_tokens"]
    # doc 3 never lands INSIDE that range (it is not a member)
    assert not (lo <= g[3]["global_offset"] < hi)
