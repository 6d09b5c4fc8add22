"""Packed-shard manifest + mid-epoch resume (functions/corpus.py
packed_shard_manifest / resume_packed_placement): the loader-facing
index over the packing family. Pins exact token partitioning across
shard windows, boundary-straddler split attribution and the
carry_in/carry_out handshake, the contiguity-derived n_seqs rule,
both placement shapes (text-only and multimodal), checkpoint-cut
resume_skip arithmetic, and stream-level agreement with
render_packed_tokens."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.corpus import (
    pack_multimodal_sequences,
    pack_sequences,
    packed_shard_manifest,
    render_packed_tokens,
    resume_packed_placement,
)


def _docs(spark, n=60):
    rows = [(i, ("alpha beta gamma delta " * (1 + i % 9)).strip())
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _mm(spark, n=60):
    docs = _docs(spark, n)
    links = spark.createDataFrame(
        [(i * 10, i) for i in range(n)], "media_id bigint, doc_id bigint"
    )
    costs = spark.createDataFrame(
        [(i * 10, 1 + i % 5) for i in range(n)],
        "media_id bigint, n_frames bigint",
    )
    return docs, links, costs


def test_manifest_partitions_the_corpus_exactly(spark):
    docs, links, costs = _mm(spark)
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=64, tokens_per_frame=16
    )
    total = placed.agg(F.sum("n_tokens")).collect()[0][0]
    man = packed_shard_manifest(
        placed, seq_tokens=64, seqs_per_shard=4
    ).collect()
    assert sum(r["n_tokens"] for r in man) == total
    assert sum(r["n_text_tokens"] + r["n_media_tokens"] for r in man) == total
    st = 64 * 4
    by_id = sorted(man, key=lambda r: r["shard_id"])
    # pack-then-chunk has no holes: every shard but the last is FULL
    for r in by_id[:-1]:
        assert r["n_tokens"] == st, r
        assert r["n_seqs"] == 4
        assert r["seq_lo"] == r["shard_id"] * 4
    last = by_id[-1]
    assert 0 < last["n_tokens"] <= st
    assert last["n_seqs"] == (last["n_tokens"] + 63) // 64
    # shard ids are the contiguous range 0..n-1
    assert [r["shard_id"] for r in by_id] == list(range(len(by_id)))


def test_straddler_split_and_carry_handshake(spark):
    """Hand-built placement: item A [0, 100), item B [100, 300) with a
    shard size of 128 tokens (seq 32 x 4): B spans three shard windows
    -- 28 tokens bill shard 0, 128 bill shard 1, 44 bill shard 2 --
    and the carry flags agree pairwise across every boundary."""
    placed = spark.createDataFrame(
        [(1, "text", 100, 0), (2, "media", 200, 100)],
        "doc_id bigint, item_type string, n_tokens bigint, global_offset bigint",
    )
    man = {
        r["shard_id"]: r
        for r in packed_shard_manifest(
            placed, seq_tokens=32, seqs_per_shard=4
        ).collect()
    }
    assert man[0]["n_tokens"] == 128
    assert man[0]["n_text_tokens"] == 100
    assert man[0]["n_media_tokens"] == 28
    assert man[0]["n_items"] == 2
    assert (man[0]["n_items_carry_in"], man[0]["n_items_carry_out"]) == (0, 1)
    assert man[1]["n_tokens"] == 128
    assert man[1]["n_media_tokens"] == 128
    assert man[1]["n_items"] == 1
    assert (man[1]["n_items_carry_in"], man[1]["n_items_carry_out"]) == (1, 1)
    assert man[2]["n_tokens"] == 44
    assert man[2]["n_media_tokens"] == 44
    assert (man[2]["n_items_carry_in"], man[2]["n_items_carry_out"]) == (1, 0)
    assert man[2]["n_seqs"] == 2  # 44 tokens over 32-token seqs
    assert man[1]["n_docs"] == man[2]["n_docs"] == 1 and man[0]["n_docs"] == 2


def test_text_only_placement_shape(spark):
    """pack_sequences rows (n_bpe_tokens, no item_type) are accepted
    as all-text items."""
    docs = _docs(spark, 30)
    placed = pack_sequences(docs, seq_tokens=64)
    man = packed_shard_manifest(placed, seq_tokens=64, seqs_per_shard=2)
    rows = man.collect()
    total = placed.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == total
    assert all(r["n_media_tokens"] == 0 for r in rows)


def test_resume_mid_item_and_at_boundary(spark):
    docs = _docs(spark, 40)
    placed = pack_sequences(docs, seq_tokens=64)
    total = placed.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    # a checkpoint that cuts an item: remaining token mass must equal
    # total - ckpt, with exactly one row carrying resume_skip > 0
    # (unless the ckpt lands exactly between items)
    ckpt_seq, ckpt_pos = 1, 17
    ckpt = ckpt_seq * 64 + ckpt_pos
    res = resume_packed_placement(
        placed, ckpt_seq, ckpt_pos, seq_tokens=64
    ).collect()
    remaining = sum(r["n_bpe_tokens"] - r["resume_skip"] for r in res)
    assert remaining == total - ckpt
    cut = [r for r in res if r["resume_skip"] > 0]
    assert len(cut) <= 1
    for r in res:
        assert r["global_offset"] + r["n_bpe_tokens"] > ckpt
    # resuming from (0, 0) is the identity with resume_skip 0
    full = resume_packed_placement(placed, 0, 0, seq_tokens=64).collect()
    assert len(full) == placed.count()
    assert all(r["resume_skip"] == 0 for r in full)


def test_resume_drops_exactly_consumed_and_keeps_zero_width(spark):
    placed = spark.createDataFrame(
        [(1, 50, 0), (2, 0, 50), (3, 30, 50)],
        "doc_id bigint, n_bpe_tokens bigint, global_offset bigint",
    )
    # ckpt = 50: item 1 ends exactly there (consumed, dropped); the
    # zero-width item 2 AT the ckpt is kept for doc accounting
    res = {r["doc_id"]: r for r in
           resume_packed_placement(placed, 0, 50, seq_tokens=64).collect()}
    assert set(res) == {2, 3}
    assert res[3]["resume_skip"] == 0 and res[2]["resume_skip"] == 0


def test_resume_agrees_with_rendered_stream(spark):
    """The contract end to end: tokens at stream positions >= ckpt ==
    the resumed placement's remaining token mass."""
    docs, links, costs = _mm(spark, 30)
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=64, tokens_per_frame=16
    )
    stream = render_packed_tokens(
        docs, links, costs, seq_tokens=64, tokens_per_frame=16
    )
    ckpt_seq, ckpt_pos = 2, 5
    ckpt = ckpt_seq * 64 + ckpt_pos
    n_after = stream.filter(
        F.col("seq_id") * 64 + F.col("seq_pos") >= ckpt
    ).count()
    res = resume_packed_placement(placed, ckpt_seq, ckpt_pos, seq_tokens=64)
    remaining = res.agg(
        F.sum(F.col("n_tokens") - F.col("resume_skip"))
    ).collect()[0][0]
    assert remaining == n_after


def test_write_read_resume_packed_corpus(spark, tmp_path):
    """The warehouse-backed loader contract end to end: one
    transaction writes shards (partitioned), manifest, placement and
    config; a rank reads exactly its shard; resume reads geometry
    from the committed config."""
    import os

    from pg_auto_dw_spark.functions.corpus import (
        read_packed_shard,
        resume_packed_corpus,
        write_packed_corpus,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    docs, links, costs = _mm(spark, 30)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = write_packed_corpus(
        wh, docs, "packed", links, costs,
        seq_tokens=64, tokens_per_frame=16, seqs_per_shard=2,
    )
    placed_total = wh.read("packed.placement").agg(
        F.sum("n_tokens")
    ).collect()[0][0]
    assert stats["tokens"] == placed_total
    man = wh.read("packed.manifest")
    assert man.count() == stats["shards"]
    assert man.agg(F.sum("n_tokens")).collect()[0][0] == stats["tokens"]
    # every sequence row landed under its shard partition directory
    shard_dir = wh.path("packed.shards")
    assert any(d.startswith("shard_id=") for d in os.listdir(shard_dir))
    # a rank's read: only its shard, in order, arrays sized to fill
    s0 = read_packed_shard(wh, "packed", 0).collect()
    assert s0 and all(r["shard_id"] == 0 for r in s0)
    assert [r["seq_id"] for r in s0] == sorted(r["seq_id"] for r in s0)
    assert all(len(r["token_ids"]) == r["n_filled"] for r in s0)
    assert all(r["seq_id"] < 2 for r in s0)  # seqs_per_shard=2
    # total filled across every shard == the manifest's token total
    all_rows = wh.read("packed.shards")
    assert all_rows.agg(F.sum("n_filled")).collect()[0][0] == stats["tokens"]
    # resume against the persisted corpus: geometry from config
    ckpt_seq, ckpt_pos = 1, 5
    res = resume_packed_corpus(wh, "packed", ckpt_seq, ckpt_pos)
    remaining = res.agg(
        F.sum(F.col("n_tokens") - F.col("resume_skip"))
    ).collect()[0][0]
    assert remaining == stats["tokens"] - (ckpt_seq * 64 + ckpt_pos)


def test_append_packed_corpus_splices_only_the_boundary(spark, tmp_path):
    """Incremental growth: appending new docs re-renders NOTHING from
    the existing epoch -- the boundary shard's partial tail sequence
    is spliced, full shards keep byte-identical files (same inodes
    through the partition-CoW hardlink), and the spliced corpus obeys
    every invariant a fresh write would."""
    import os

    from pg_auto_dw_spark.functions.corpus import (
        append_packed_corpus,
        resume_packed_corpus,
        write_packed_corpus,
    )
    from pg_auto_dw_spark.warehouse import Warehouse

    docs_a, links_a, costs_a = _mm(spark, 30)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats_a = write_packed_corpus(
        wh, docs_a, "grow", links_a, costs_a,
        seq_tokens=64, tokens_per_frame=16, seqs_per_shard=2,
    )
    boundary_seq = stats_a["tokens"] // 64
    boundary_shard = stats_a["tokens"] // 128
    assert boundary_shard >= 1, "fixture must span multiple shards"
    old_boundary = {
        r["seq_id"]: r["token_ids"]
        for r in wh.read("grow.shards")
        .filter(F.col("shard_id") == boundary_shard)
        .collect()
    }

    def inodes(shard):
        d = os.path.join(wh.path("grow.shards"), f"shard_id={shard}")
        return {f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if f.endswith(".parquet")}

    before = inodes(0)

    # disjoint id space for the appended batch
    docs_b = spark.createDataFrame(
        [(1000 + i, ("omega psi chi " * (1 + i % 5)).strip())
         for i in range(20)],
        "doc_id bigint, text string",
    )
    links_b = spark.createDataFrame(
        [(10_000 + i, 1000 + i) for i in range(20)],
        "media_id bigint, doc_id bigint",
    )
    costs_b = spark.createDataFrame(
        [(10_000 + i, 1 + i % 3) for i in range(20)],
        "media_id bigint, n_frames bigint",
    )
    stats = append_packed_corpus(wh, docs_b, "grow", links_b, costs_b)

    tok_b = (
        wh.read("grow.placement")
        .filter(F.col("doc_id") >= 1000)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert stats["tokens"] == stats_a["tokens"] + tok_b
    # untouched full shard: same parquet files, same inodes (CoW)
    assert inodes(0) == before
    # contiguity across the splice: every sequence but the last FULL
    rows = sorted(
        wh.read("grow.shards").collect(), key=lambda r: r["seq_id"]
    )
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r["n_filled"] == 64, r["seq_id"]
    assert sum(r["n_filled"] for r in rows) == stats["tokens"]
    # the spliced boundary sequence keeps its old prefix verbatim
    if boundary_seq in old_boundary:  # old total not seq-aligned
        new_arr = next(
            r["token_ids"] for r in rows if r["seq_id"] == boundary_seq
        )
        old_arr = old_boundary[boundary_seq]
        assert new_arr[: len(old_arr)] == old_arr
        assert len(new_arr) > len(old_arr)
    # manifest recomputed consistently; resume sees the grown corpus
    man = wh.read("grow.manifest")
    assert man.agg(F.sum("n_tokens")).collect()[0][0] == stats["tokens"]
    res = resume_packed_corpus(wh, "grow", 0, 0)
    assert res.agg(F.sum("n_tokens")).collect()[0][0] == stats["tokens"]


def test_manifest_duckdb_replay(spark):
    """Oracle-grade cross-check without a rotation slot: the manifest
    is all-integer overlap arithmetic, so DuckDB replays it exactly
    from the raw placement rows -- every column, every shard."""
    import duckdb

    docs, links, costs = _mm(spark, 40)
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=64, tokens_per_frame=16
    )
    pdf = placed.select(
        "doc_id", "item_type", "n_tokens", "global_offset"
    ).toPandas()
    got = sorted(
        packed_shard_manifest(
            placed, seq_tokens=64, seqs_per_shard=4
        ).collect(),
        key=lambda r: r["shard_id"],
    )
    con = duckdb.connect()
    con.register("p", pdf)
    want = con.execute(
        """
        WITH x AS (
            SELECT doc_id, item_type, n_tokens, global_offset,
                   global_offset + n_tokens AS e,
                   unnest(range(global_offset // 256,
                                (global_offset + n_tokens - 1) // 256 + 1))
                       AS shard_id
            FROM p WHERE n_tokens > 0),
        y AS (
            SELECT *,
                   LEAST(e, (shard_id + 1) * 256)
                   - GREATEST(global_offset, shard_id * 256) AS tok
            FROM x)
        SELECT shard_id,
               shard_id * 4 AS seq_lo,
               (SUM(tok) + 63) // 64 AS n_seqs,
               SUM(tok) AS n_tokens,
               SUM(CASE WHEN item_type = 'text' THEN tok ELSE 0 END)
                   AS n_text_tokens,
               SUM(CASE WHEN item_type <> 'text' THEN tok ELSE 0 END)
                   AS n_media_tokens,
               COUNT(*) AS n_items,
               SUM(CASE WHEN global_offset < shard_id * 256
                        THEN 1 ELSE 0 END) AS n_items_carry_in,
               SUM(CASE WHEN e > (shard_id + 1) * 256
                        THEN 1 ELSE 0 END) AS n_items_carry_out,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM y GROUP BY shard_id ORDER BY shard_id
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert tuple(g) == tuple(int(v) for v in w), (tuple(g), w)
