"""SemDeDup for media (multimodal.media_semantic_near_dup_pairs):
the position-free complement of the perceptual-hash families. The
pinned scenario is the one that motivates running both: a re-encode
that REORDERS content (block swap) defeats positional dHash outright
while the trigram-histogram embedding barely moves."""

import random

from pg_auto_dw_spark.functions.multimodal import (
    media_semantic_near_dup_pairs,
    perceptual_hashes,
)


def _noise(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, t, p, None) for i, t, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )


A = _noise(1, 1440)
B = A[720:] + A[:720]  # block swap: same content, new order
C = _noise(2, 1440)  # unrelated


def test_block_swap_defeats_dhash_but_not_semantic(spark):
    media = _media(spark, [(1, "image", A), (2, "image", B), (3, "image", C)])
    h = {r["media_id"]: r["dhash"] for r in perceptual_hashes(media).collect()}
    swapped_hamming = bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1")
    assert swapped_hamming > 6  # the positional family MISSES this pair

    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in media_semantic_near_dup_pairs(media, threshold=0.95).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99  # semantic catches it
    assert not any(3 in p for p in pairs)  # unrelated never pairs


def test_types_isolated_and_nulls_dropped(spark):
    media = _media(spark, [
        (1, "image", A), (2, "audio", A),  # same bytes, different family
        (3, "image", None),
        (10, "audio", A[720:] + A[:720]), (11, "audio", _noise(9, 1440)),
    ])
    pairs = {
        (r["media_type"], r["id_a"], r["id_b"])
        for r in media_semantic_near_dup_pairs(media, threshold=0.95).collect()
    }
    # the audio block-swap twin pairs within its family; the identical
    # image/audio byte twins never pair across families
    assert ("audio", 2, 10) in pairs
    assert not any(a == 1 or b == 1 for _, a, b in pairs)
    assert not any(a == 3 or b == 3 for _, a, b in pairs)
