"""Interleaved multimodal sequence packing (r14 VERDICT #3):
pack_multimodal_sequences extends the pack_sequences placement
contract to examples carrying media items, each costing
n_frames * tokens_per_frame vision tokens (or a banded cost column).
The map must be contiguous, media-first-then-text within an example,
and bit-identical across partitionings -- same bar as the text-only
planner."""

import pytest
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.corpus import (
    pack_multimodal_sequences,
    pack_sequences,
)
from pg_auto_dw_spark.sources import load_table


def _small(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta"), (3, "epsilon zeta")],
        "doc_id long, text string",
    )
    links = spark.createDataFrame(
        # doc 1 carries media 10 and 11; doc 3 carries media 12;
        # doc 2 is text-only; duplicate link collapses; link to a
        # missing doc drops
        [(10, 1), (11, 1), (10, 1), (12, 3), (99, 7)],
        "media_id long, doc_id long",
    )
    costs = spark.createDataFrame(
        [(10, 1), (11, 4), (12, 2), (99, 1)], "media_id long, n_frames long"
    )
    return docs, links, costs


def test_layout_media_first_then_text(spark):
    docs, links, costs = _small(spark)
    out = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=64, tokens_per_frame=8
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3}  # link to absent doc 7 dropped
    d1 = sorted(by_doc[1], key=lambda r: r["item_no"])
    assert [r["item_type"] for r in d1] == ["media", "media", "text"]
    assert [r["media_id"] for r in d1] == [10, 11, None]  # media_id order
    assert [r["n_tokens"] for r in d1] == [8, 32, 3]  # frames*8, then text
    # items are contiguous inside the example
    assert d1[1]["global_offset"] == d1[0]["global_offset"] + 8
    assert d1[2]["global_offset"] == d1[1]["global_offset"] + 32
    assert len(by_doc[2]) == 1 and by_doc[2][0]["item_type"] == "text"
    # duplicate (10, 1) link collapsed to one item
    assert sum(1 for r in d1 if r["media_id"] == 10) == 1


def test_global_stream_contiguous_and_deterministic(spark, sf_dir):
    """Full-corpus map: sorted global offsets form an exact prefix sum
    of item token counts (no gap or overlap anywhere in the stream),
    seq coordinates derive from the offset, and the placement is
    bit-identical across input partitionings."""
    docs = load_table(spark, sf_dir, "documents")
    links = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"), F.col("doc_id").alias("doc_id")
    )
    costs = links.select(
        "media_id", (F.col("media_id") % 7 + 1).cast("long").alias("n_frames")
    )
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=512, tokens_per_frame=16
    ).collect()
    n_docs = docs.count()
    n_media = links.count()
    assert len(placed) == n_docs + n_media
    cum = 0
    for r in sorted(placed, key=lambda r: r["global_offset"]):
        assert r["global_offset"] == cum
        assert r["seq_id"] == cum // 512
        assert r["seq_offset"] == cum % 512
        cum += r["n_tokens"]
    again = pack_multimodal_sequences(
        docs.repartition(7), links.repartition(5), costs,
        seq_tokens=512, tokens_per_frame=16,
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, placed))


def test_text_only_degenerates_to_pack_sequences(spark, sf_dir):
    """With no links the map IS pack_sequences' (one text item per doc
    at the same offsets) -- the extension is strictly additive."""
    docs = load_table(spark, sf_dir, "documents")
    empty_links = spark.createDataFrame([], "media_id long, doc_id long")
    empty_costs = spark.createDataFrame([], "media_id long, n_frames long")
    mm = {
        r["doc_id"]: (r["n_tokens"], r["global_offset"], r["item_no"],
                      r["item_type"])
        for r in pack_multimodal_sequences(
            docs, empty_links, empty_costs, seq_tokens=512
        ).collect()
    }
    base = {
        r["doc_id"]: (r["n_bpe_tokens"], r["global_offset"])
        for r in pack_sequences(docs, seq_tokens=512).collect()
    }
    assert set(mm) == set(base)
    for did, (ntok, off) in base.items():
        assert mm[did] == (ntok, off, 0, "text")


def test_missing_cost_row_fails_loudly(spark):
    """A linked media_id absent from media_costs must fail with the id
    in the message, not silently shrink the layout (the
    pack_sequences token_counts_df convention)."""
    docs, links, costs = _small(spark)
    partial = costs.filter(F.col("media_id") != 11)
    with pytest.raises(Exception, match="media_id=11"):
        pack_multimodal_sequences(docs, links, partial).collect()


def test_banded_cost_col(spark):
    """cost_col bypasses frames*tokens_per_frame: the banded budget
    column is the per-item cost verbatim."""
    docs, links, _ = _small(spark)
    banded = spark.createDataFrame(
        [(10, 100), (11, 200), (12, 300)], "media_id long, vis_tokens long"
    )
    out = pack_multimodal_sequences(
        docs, links, banded, tokens_per_frame=999, cost_col="vis_tokens"
    ).collect()
    got = {r["media_id"]: r["n_tokens"] for r in out if r["media_id"]}
    assert got == {10: 100, 11: 200, 12: 300}


def test_pack_multimodal_stats_accounts_everything(spark, sf_dir):
    """The stats row reconciles exactly with the placement map: token
    splits sum to the total, straddle counts match a direct filter,
    and the media/text item split is exact."""
    from pg_auto_dw_spark.functions.corpus import pack_multimodal_stats

    docs = load_table(spark, sf_dir, "documents")
    links = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"), F.col("doc_id").alias("doc_id")
    )
    costs = links.select(
        "media_id", (F.col("media_id") % 7 + 1).cast("long").alias("n_frames")
    )
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=512, tokens_per_frame=16
    )
    s = pack_multimodal_stats(
        docs, links, costs, seq_tokens=512, tokens_per_frame=16
    ).collect()[0]
    agg = placed.agg(
        F.count(F.lit(1)), F.sum("n_tokens"),
        F.sum(F.when(F.col("item_type") == "media", F.col("n_tokens"))
              .otherwise(F.lit(0))),
    ).collect()[0]
    assert s["n_items"] == agg[0]
    assert s["total_tokens"] == agg[1]
    assert s["media_tokens"] == agg[2]
    assert s["text_tokens"] == s["total_tokens"] - s["media_tokens"]
    assert s["n_examples"] == docs.count()
    assert s["n_media_items"] == links.count()
    assert s["n_sequences"] == -(-s["total_tokens"] // 512)
    straddle = placed.filter(
        (F.col("seq_offset") + F.col("n_tokens")) > 512
    )
    assert s["n_straddling_items"] == straddle.count()
    assert s["n_straddling_media"] == straddle.filter(
        F.col("item_type") == "media"
    ).count()
    assert 0 < s["last_seq_fill"] <= 512


def test_null_text_places_zero_width(spark):
    """r15 fix: a NULL-text doc must place as a ZERO-width item at a
    well-defined offset -- before the coalesce, its NULL count skipped
    the offset window sums and two docs silently shared an offset."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "gamma")],
        "doc_id long, text string",
    )
    links = spark.createDataFrame([], "media_id long, doc_id long")
    costs = spark.createDataFrame([], "media_id long, n_frames long")
    for placed, col in (
        (pack_sequences(docs, seq_tokens=8).collect(), "n_bpe_tokens"),
        (pack_multimodal_sequences(docs, links, costs, seq_tokens=8).collect(),
         "n_tokens"),
    ):
        tok = {r["doc_id"]: r[col] for r in placed}
        assert tok[2] == 0  # zero-width, never NULL
        # offsets form an exact prefix sum (no overlap, no gap); a
        # zero-width row shares its offset with its successor BY
        # DESIGN, so order zero-width rows first at equal offsets
        cum = 0
        for r in sorted(placed, key=lambda r: (r["global_offset"], r[col])):
            assert r["global_offset"] == cum
            cum += r[col]


def test_render_packed_tokens_stream_exact(spark):
    """The writer's stream is position-exact: every (seq_id, seq_pos)
    is distinct and gap-free over [0, total); text token ids are the
    md5-hash of the SAME regex tokens the budget counted; media items
    emit their full placeholder run."""
    from pg_auto_dw_spark.functions.corpus import render_packed_tokens

    docs, links, costs = _small(spark)
    stream = render_packed_tokens(
        docs, links, costs, seq_tokens=16, tokens_per_frame=8,
        media_token_id=-7,
    ).collect()
    # total = text tokens (3+1+2) + media (8 + 32 + 16) = 62
    assert len(stream) == 62
    positions = sorted(r["seq_id"] * 16 + r["seq_pos"] for r in stream)
    assert positions == list(range(62))  # gap-free, overlap-free
    media_rows = [r for r in stream if r["item_type"] == "media"]
    assert len(media_rows) == 56
    assert all(r["token_id"] == -7 for r in media_rows)
    text_rows = [r for r in stream if r["item_type"] == "text"]
    assert all(0 <= r["token_id"] < 32768 for r in text_rows)
    # same token -> same id (hashed vocab is deterministic): doc 1's
    # text "alpha beta gamma" and doc 3's "epsilon zeta" never collide
    # with the media placeholder
    assert all(r["token_id"] != -7 for r in text_rows)


def test_render_matches_placement_map(spark, sf_dir):
    """Stream-reconstructed item extents equal the placement map: per
    (doc, item_type) the min global position and the count equal the
    map's global_offset and n_tokens -- the writer and the planner
    agree token for token."""
    from pg_auto_dw_spark.functions.corpus import render_packed_tokens

    docs = load_table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    links = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"), "doc_id"
    )
    costs = links.select(
        "media_id", (F.col("media_id") % 5 + 1).cast("long").alias("n_frames")
    )
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=256, tokens_per_frame=4
    )
    stream = render_packed_tokens(
        docs, links, costs, seq_tokens=256, tokens_per_frame=4
    )
    got = {
        (r["doc_id"], r["item_type"]): (r["off"], r["cnt"])
        for r in stream.groupBy("doc_id", "item_type").agg(
            F.min(F.col("seq_id") * 256 + F.col("seq_pos")).alias("off"),
            F.count(F.lit(1)).alias("cnt"),
        ).collect()
    }
    for r in placed.collect():
        if r["n_tokens"] == 0:
            continue  # zero-width items emit no stream rows
        key = (r["doc_id"], r["item_type"])
        off, cnt = got[key]
        if r["item_type"] == "text":
            assert (off, cnt) == (r["global_offset"], r["n_tokens"])


def test_collect_packed_sequences(spark):
    """Loader rows: full sequences are exactly seq_tokens long, the
    final one short, order within a sequence is position order."""
    from pg_auto_dw_spark.functions.corpus import (
        collect_packed_sequences,
        render_packed_tokens,
    )

    docs, links, costs = _small(spark)
    stream = render_packed_tokens(
        docs, links, costs, seq_tokens=16, tokens_per_frame=8,
        media_token_id=-7,
    )
    seqs = {r["seq_id"]: r for r in
            collect_packed_sequences(stream, seq_tokens=16).collect()}
    total = 62
    assert sorted(seqs) == list(range(-(-total // 16)))
    for sid, r in seqs.items():
        assert r["n_filled"] == (16 if sid < total // 16 else total % 16)
        assert len(r["token_ids"]) == r["n_filled"]
    # cross-check one sequence against the raw stream ordering
    raw = sorted(
        ((r["seq_pos"], r["token_id"]) for r in stream.collect()
         if r["seq_id"] == 0)
    )
    assert [t for _, t in raw] == list(seqs[0]["token_ids"])


def test_epoch_salt_reshuffles_deterministically(spark, sf_dir):
    """epoch_salt is the zero-cost epoch reshuffle: a different salt
    permutes the global order (same totals, same per-doc widths), the
    same salt reproduces it bit-exactly, and "" keeps the historical
    order."""
    from pg_auto_dw_spark.functions.corpus import pack_sequences

    docs = load_table(spark, sf_dir, "documents").limit(300).localCheckpoint()
    base = {r["doc_id"]: r["global_offset"]
            for r in pack_sequences(docs, seq_tokens=512).collect()}
    e1 = {r["doc_id"]: r["global_offset"]
          for r in pack_sequences(docs, seq_tokens=512,
                                  epoch_salt="epoch1").collect()}
    e1b = {r["doc_id"]: r["global_offset"]
           for r in pack_sequences(docs, seq_tokens=512,
                                   epoch_salt="epoch1").collect()}
    assert e1 == e1b                       # same salt: bit-exact
    assert e1 != base                      # new salt: new order
    assert set(e1) == set(base)            # same docs
    # same total stream length either way
    tok = {r["doc_id"]: r["n_bpe_tokens"]
           for r in pack_sequences(docs, seq_tokens=512).collect()}
    assert max(o + tok[d] for d, o in e1.items()) == \
        max(o + tok[d] for d, o in base.items())
    # the multimodal planner takes the same knob
    links = spark.createDataFrame([], "media_id long, doc_id long")
    costs = spark.createDataFrame([], "media_id long, n_frames long")
    mm = {r["doc_id"]: r["global_offset"]
          for r in pack_multimodal_sequences(
              docs, links, costs, seq_tokens=512, epoch_salt="epoch1"
          ).collect()}
    assert mm == e1  # degeneration holds under the salt too
