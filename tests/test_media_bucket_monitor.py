"""Composed bucket monitoring across the media near-dup families
(r12 VERDICT directive 4): plant a constant-media block beside real
near-dup twins, run `hamming_bucket_stats` beside the pair job on the
SAME hash frame, and assert (a) the monitor surfaces the hot buckets
the blank block creates, (b) cap saturation costs real recall (the
planted twin pair is MISSED while the blanks saturate its buckets),
and (c) `min_spread` suppression recovers it (twins pair, spurious
blank cliques vanish, the monitor goes quiet).

The image/audio constructions reproduce the degenerate low-entropy
regime the r12 video 10x probe measured, in miniature: twins that are
near-flat except one structured chunk, so every OTHER chunk bucket is
the zero bucket the blank block saturates -- exactly how a low-entropy
corpus loses recall corpus-wide instead of on a tail."""

from pg_auto_dw_spark.functions.dedup import (
    hamming_bucket_stats,
    hamming_chunk_pairs,
)
from pg_auto_dw_spark.functions.multimodal import (
    audio_fingerprints,
    audio_near_dup_pairs,
    image_near_dup_pairs,
    perceptual_hashes,
    video_frame_hashes,
    video_near_dup_pairs,
)

CAP = 8


def _ramped(cell_vals: list[int], cell_bytes: int, tail_cells: int) -> bytes:
    """Payload whose stub grid is `cell_vals` then `tail_cells` cells
    of 128: structured head (one dHash chunk), flat tail (all other
    chunks zero -- the near-flat twin shape)."""
    body = b"".join(bytes([v]) * cell_bytes for v in cell_vals)
    return body + bytes([128]) * (cell_bytes * tail_cells)


# Image grid is 9x8 = 72 cells; vary cells 0..8 (dHash row 0 = bits
# 0..7 = chunk 0), leave cells 9..71 flat. Twin B flips exactly two
# row-0 comparisons, so hamming(A, B) = 2 but their chunk-0 values
# differ -- the pair is reachable ONLY through the zero buckets.
_IMG_A = _ramped([10, 30, 50, 70, 90, 110, 130, 150, 170], 10, 63)
_IMG_B = _ramped([10, 30, 50, 70, 90, 110, 130, 130, 110], 10, 63)
# Audio envelope is 65 cells: same construction, cells 0..8 ramped.
# The 1-D envelope compares ACROSS the cell 8/9 boundary (bit 8 =
# env[9] > env[8]), so the twin edit flips two bits at the HEAD of the
# ramp and leaves cell 8 alone -- hamming stays exactly 2 and bit 8
# (chunk 1) stays equal on both sides.
_AUD_A = _ramped([10, 30, 50, 70, 90, 110, 130, 150, 170], 10, 56)
_AUD_B = _ramped([10, 10, 10, 70, 90, 110, 130, 150, 170], 10, 56)


def _media(spark, mtype, rows):
    return spark.createDataFrame(
        [(i, mtype, p, None) for i, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )


def _image_like_case(spark, mtype, a, b, flat_len, hash_fn, pair_fn, col):
    """Shared scenario for the image and audio families."""
    flat = bytes([128]) * flat_len
    rows = [(i, flat) for i in range(1, 13)] + [(100, a), (101, b)]
    media = _media(spark, mtype, rows)

    # --- suppression OFF: monitor + pairs on the SAME hash frame ---
    hashes = hash_fn(media).filter(f"{col} is not null").cache()
    monitor = hamming_bucket_stats(
        hashes, col, "media_id", max_bucket_size=CAP
    ).collect()
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_chunk_pairs(
            hashes, col, "media_id",
            max_hamming=6, bits=64, n_chunks=8, max_bucket_size=CAP,
        ).collect()
    }
    hashes.unpersist()
    # the blank block saturates its buckets and the monitor says so
    assert monitor and all(r["n"] > CAP for r in monitor)
    assert sum(r["pairs_suppressed"] for r in monitor) > 0
    # recall loss is REAL: the twins' only shared buckets are the
    # saturated zero buckets, so the planted pair is missed...
    assert (100, 101) not in pairs
    # ...while the blank block pairs among itself (the spurious clique)
    assert any(a < 13 and b < 13 for a, b in pairs)

    # --- suppression ON: blanks emit NULL hashes, recall recovers ---
    kept = hash_fn(media, min_spread=5).filter(f"{col} is not null").cache()
    assert {r["media_id"] for r in kept.select("media_id").collect()} == {100, 101}
    assert hamming_bucket_stats(
        kept, col, "media_id", max_bucket_size=CAP
    ).collect() == []  # monitor quiet: no over-cap bucket survives
    on = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in pair_fn(media, max_bucket_size=CAP, min_spread=5).collect()
    }
    kept.unpersist()
    assert set(on) == {(100, 101)} and on[(100, 101)] == 2


def test_image_monitor_and_suppression_composed(spark):
    _image_like_case(
        spark, "image", _IMG_A, _IMG_B, 720,
        perceptual_hashes, image_near_dup_pairs, "dhash",
    )


def test_audio_monitor_and_suppression_composed(spark):
    _image_like_case(
        spark, "audio", _AUD_A, _AUD_B, 650,
        audio_fingerprints, audio_near_dup_pairs, "afp",
    )


def test_video_monitor_and_suppression_composed(spark):
    """Video: blank videos form a spurious near-dup clique and hot
    frame buckets; suppression removes both while the structured twin
    pair keeps its full shared-frames evidence."""
    import random

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(1600))
    edit = base[:600] + bytes(rng.randrange(256) for _ in range(400)) + base[1000:]
    flat = bytes([128]) * 1600
    rows = [(i, flat) for i in range(1, 11)] + [(100, base), (101, edit)]
    media = _media(spark, "video", rows)

    frames = video_frame_hashes(media, max_frames=8)
    from pyspark.sql import functions as F

    keyed = frames.select(
        (F.col("media_id") * (1 << 20) + F.col("frame_no")).alias("fk"), "fhash"
    )
    monitor = hamming_bucket_stats(
        keyed, "fhash", "fk", max_bucket_size=16
    ).collect()
    assert monitor and sum(r["pairs_suppressed"] for r in monitor) > 0

    off = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_near_dup_pairs(
            media, max_frames=8, max_bucket_size=16
        ).collect()
    }
    assert any(a < 11 and b < 11 for a, b in off)  # blank clique pairs
    assert (100, 101) in off

    on = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_near_dup_pairs(
            media, max_frames=8, max_bucket_size=16, min_spread=5
        ).collect()
    }
    assert set(on) == {(100, 101)}  # clique gone, twins intact
    assert on[(100, 101)] == off[(100, 101)]  # evidence count unchanged
    kept = video_frame_hashes(media, max_frames=8, min_spread=5).select(
        (F.col("media_id") * (1 << 20) + F.col("frame_no")).alias("fk"), "fhash"
    )
    assert hamming_bucket_stats(
        kept, "fhash", "fk", max_bucket_size=16
    ).collect() == []
