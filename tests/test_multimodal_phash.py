"""Perceptual-hash image near-dup (r11 VERDICT directive 5):
dHash/pHash over the decoded-media seam, pigeonhole Hamming pairing
(the shared dedup.hamming_chunk_pairs join), connected-components
composition, and the hot-bucket cap."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.dedup import (
    connected_components,
    hamming_chunk_pairs,
)
from pg_auto_dw_spark.functions.multimodal import (
    _dhash64,
    _gray_grid,
    _phash64,
    image_near_dup_pairs,
    perceptual_hashes,
)


def _payload(seed: int, n: int = 720) -> bytes:
    return bytes((seed * 37 + i * 11 + (i * i) % 31) % 256 for i in range(n))


def _edited(b: bytes, at: int = 100, span: int = 8) -> bytes:
    # a local edit: one region re-toned, the rest untouched -- the
    # near-dup shape a crop/re-encode produces under the stub decode
    return b[:at] + bytes((x + 40) % 256 for x in b[at : at + span]) + b[at + span :]


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", p, None) for i, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )


def test_hashes_deterministic_and_locality(spark):
    base = _payload(1)
    rows = perceptual_hashes(
        _media(spark, [(1, base), (2, base), (3, _edited(base)), (4, _payload(99))])
    ).collect()
    h = {r["media_id"]: r for r in rows}
    assert h[1]["dhash"] == h[2]["dhash"] and h[1]["phash"] == h[2]["phash"]
    near = bin((h[1]["dhash"] ^ h[3]["dhash"]) & ((1 << 64) - 1)).count("1")
    far = bin((h[1]["dhash"] ^ h[4]["dhash"]) & ((1 << 64) - 1)).count("1")
    assert near <= 6 < far  # local edit flips few gradient bits


def test_non_image_and_null_rows(spark):
    df = spark.createDataFrame(
        [(1, "audio", _payload(1), None), (2, "image", None, None),
         (3, "image", _payload(2), None)],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    rows = {r["media_id"]: r for r in perceptual_hashes(df).collect()}
    assert set(rows) == {2, 3}  # audio dropped
    assert rows[2]["dhash"] is None and rows[2]["phash"] is None
    pairs = image_near_dup_pairs(df).collect()
    assert pairs == []  # NULL hashes never pair


def test_pigeonhole_complete_vs_brute_force(spark):
    """Uncapped blocked pairs == brute-force hamming <= k pairs (the
    WWW'07 guarantee, k=6 < 8 chunks)."""
    base = _payload(3)
    rows = [(1, base), (2, _edited(base)), (3, _edited(base, at=300)),
            (4, _payload(50)), (5, _payload(51)), (6, base)]
    media = _media(spark, rows)
    hashes = {r["media_id"]: r["dhash"] for r in perceptual_hashes(media).collect()}
    brute = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b
        and bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 6
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(media, max_bucket_size=10**6).collect()
    }
    assert blocked == brute
    assert (1, 6) in blocked  # identical pair, hamming 0


def test_cluster_composition(spark):
    """pairs -> connected_components, exactly like the text families."""
    base_a, base_b = _payload(7), _payload(70)
    media = _media(
        spark,
        [(1, base_a), (2, _edited(base_a)), (3, base_a),
         (10, base_b), (11, _edited(base_b)), (20, _payload(500))],
    )
    pairs = image_near_dup_pairs(media)
    nodes = media.select(F.col("media_id"))
    comp = connected_components(pairs.select("id_a", "id_b"), nodes=nodes,
                                id_col="media_id")
    clusters = {}
    for r in comp.collect():
        clusters.setdefault(r["cluster_id"], set()).add(r["media_id"])
    assert {1, 2, 3} in clusters.values()
    assert {10, 11} in clusters.values()
    assert {20} in clusters.values()


def test_hot_bucket_cap_bounds_pairs(spark):
    """A constant-image corpus (every blank thumbnail hashes
    identically) is the quadratic poison; the cap bounds the pair
    count at the documented recall trade (uncapped ids beyond the cap
    stay unpaired -- bounded recall loss on oversize buckets)."""
    blank = bytes(720)
    media = _media(spark, [(i, blank) for i in range(60)])
    capped = image_near_dup_pairs(media, max_bucket_size=10).collect()
    assert 0 < len(capped) <= 45  # C(10,2): same ids survive every chunk
    full = image_near_dup_pairs(media, max_bucket_size=10**6).collect()
    assert len(full) == 60 * 59 // 2


def test_generic_hamming_join_matches_simhash_semantics(spark):
    """hamming_chunk_pairs on a hand-built hash frame: exact pair set."""
    df = spark.createDataFrame(
        [(1, 0b1111), (2, 0b1110), (3, 0b0000)], "id bigint, h bigint"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_chunk_pairs(
            df, "h", "id", max_hamming=1, bits=4, n_chunks=2
        ).collect()
    }
    assert got == {(1, 2): 1}


def test_grid_and_hash_units():
    g = _gray_grid(bytes(range(72)), 9, 8)
    assert len(g) == 72 and g == list(range(72))  # 1 byte per cell
    assert _gray_grid(b"", 9, 8) == [0] * 72
    # monotone grid: every adjacent comparison is 'greater' -> all 64
    # bits set -> signed -1
    assert _dhash64(list(range(72))) == -1
    assert isinstance(_phash64([0] * 1024), int)


def test_batched_kernels_equal_scalar_spec():
    """r15 optimization pin: the vectorized numpy batch kernels
    (_seg_avg_grids / _dhash64_batch / _phash64_batch) reproduce the
    scalar executable spec (_gray_grid / _dhash64 / _phash64)
    bit-for-bit over varied payload lengths, including sub-cell-count
    payloads and flat (zero-spread) payloads."""
    import numpy as np

    from pg_auto_dw_spark.functions.multimodal import (
        _concat_payloads,
        _dhash64_batch,
        _phash64_batch,
        _seg_avg_grids,
    )

    payloads = (
        [_payload(s, n) for s, n in [(1, 720), (2, 3), (3, 71), (4, 72),
                                     (5, 73), (6, 1024), (7, 1), (8, 5000)]]
        + [bytes([50] * 700), bytes([0] * 64), b"\xff"]
    )
    buf, starts, lengths = _concat_payloads(payloads)
    small = _seg_avg_grids(buf, starts, lengths, 72)
    big = _seg_avg_grids(buf, starts, lengths, 1024)
    dhs = _dhash64_batch(small)
    phs = _phash64_batch(big)
    for i, p in enumerate(payloads):
        g_small = _gray_grid(p, 9, 8)
        g_big = _gray_grid(p, 32, 32)
        assert list(small[i]) == g_small, f"small grid row {i}"
        assert list(big[i]) == g_big, f"big grid row {i}"
        assert int(dhs[i]) == _dhash64(g_small), f"dhash row {i}"
        assert int(phs[i]) == _phash64(g_big), f"phash row {i}"
    # the min_spread keep-mask matches the scalar spread predicate
    spread = small.max(axis=1) - small.min(axis=1)
    for i, p in enumerate(payloads):
        g = _gray_grid(p, 9, 8)
        assert (int(spread[i]) >= 5) == (max(g) - min(g) >= 5)
    assert not (spread >= 5)[8]  # the flat tone row is suppressed
    assert isinstance(np.asarray(dhs).dtype.type(0), np.int64)


def test_batched_family_kernels_equal_scalar_spec():
    """r15 optimization pin for the remaining batched families: audio
    envelope hashes, video frame expansion + hashes, byte histograms,
    and trigram embeddings each reproduce their scalar loops exactly."""
    import math

    from pg_auto_dw_spark.functions.multimodal import (
        _byte_histograms,
        _concat_payloads,
        _dhash64_batch,
        _fake_decode,
        _seg_avg_grids,
        _trigram_embeddings,
        _video_frame_index,
    )

    payloads = [_payload(s, n) for s, n in
                [(1, 3), (2, 64), (3, 65), (4, 120), (5, 700), (6, 5000)]]
    buf, starts, lengths = _concat_payloads(payloads)
    env = _seg_avg_grids(buf, starts, lengths, 65)
    ah = _dhash64_batch(env, w=65, h=1)
    for i, p in enumerate(payloads):
        e = _gray_grid(p, 65, 1)
        assert list(env[i]) == e and int(ah[i]) == _dhash64(e, w=65, h=1)

    for mf in (16, 3, 1):
        vid, fno, fs, fl = _video_frame_index(starts, lengths, mf)
        g = _seg_avg_grids(buf, fs, fl, 72)
        vh = _dhash64_batch(g)
        r = 0
        for i, p in enumerate(payloads):
            k = max(1, min(_fake_decode("video", p)["n_frames"], mf))
            for f in range(k):
                lo, hi = f * len(p) // k, max((f + 1) * len(p) // k, f * len(p) // k + 1)
                gg = _gray_grid(p[lo:hi], 9, 8)
                assert (int(vid[r]), int(fno[r])) == (i, f)
                assert list(g[r]) == gg and int(vh[r]) == _dhash64(gg)
                r += 1
        assert r == len(vid)

    for i, b in enumerate(_byte_histograms(payloads + [b""])):
        p = (payloads + [b""])[i]
        counts = [0] * 8
        for byte in p:
            counts[byte >> 5] += 1
        assert b == [c / max(len(p), 1) for c in counts]

    for dims in (64, 16):
        got = _trigram_embeddings(payloads, dims)
        for i, p in enumerate(payloads):
            v = [0.0] * dims
            for j in range(len(p) - 2):
                h = (p[j] * 65599 + p[j + 1]) * 65599 + p[j + 2]
                v[h % dims] += 1.0 if (h >> 7) & 1 else -1.0
            n = math.sqrt(sum(x * x for x in v))
            assert got[i] == ([x / n for x in v] if n > 0 else v)


def test_perceptual_hashes_mixed_flat_batch_min_spread(spark):
    """The mixed keep/suppress batch path (flat rows interleaved with
    structured ones under min_spread) matches the scalar per-row
    answer -- exercises the kept-subset re-index of the pHash grid."""
    base = _payload(1)
    rows = [(1, base), (2, bytes([7] * 300)), (3, _edited(base)),
            (4, bytes([200] * 90)), (5, _payload(9))]
    got = {
        r["media_id"]: (r["dhash"], r["phash"])
        for r in perceptual_hashes(_media(spark, rows), min_spread=5).collect()
    }
    for mid, p in rows:
        g = _gray_grid(p, 9, 8)
        if max(g) - min(g) < 5:
            assert got[mid] == (None, None), mid
        else:
            assert got[mid] == (_dhash64(g), _phash64(_gray_grid(p, 32, 32))), mid


SIGNED64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(hashes=st.lists(SIGNED64, min_size=2, max_size=24, unique=True),
       k=st.integers(0, 7))
def test_pigeonhole_property_blocked_equals_brute(spark, hashes, k):
    """Hypothesis pin of the WWW'07 guarantee on ARBITRARY signed
    64-bit fingerprints: for any hamming budget k < 8 chunks, the
    uncapped pigeonhole join returns exactly the brute-force pair set
    (arithmetic-shift sign-extension masked off per chunk, DISTINCT
    across multi-chunk agreement, self-pairs excluded)."""
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id bigint, h bigint"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_chunk_pairs(
            df, "h", "id", max_hamming=k, bits=64, n_chunks=8
        ).collect()
    }
    mask = (1 << 64) - 1
    want = {
        (a, b): bin((hashes[a] ^ hashes[b]) & mask).count("1")
        for a in range(len(hashes))
        for b in range(a + 1, len(hashes))
        if bin((hashes[a] ^ hashes[b]) & mask).count("1") <= k
    }
    assert got == want


def test_hamming_bucket_stats_monitor(spark):
    """r12: the pigeonhole twin of lsh_hot_bucket_stats -- over-cap
    (pos, val) buckets surface with exact suppressed-pair accounting;
    a healthy frame stays silent."""
    from pg_auto_dw_spark.functions.dedup import hamming_bucket_stats

    # 30 identical hashes: every one of the 8 chunk buckets holds 30
    hot = spark.createDataFrame(
        [(i, 0) for i in range(30)], "id bigint, h bigint"
    )
    rows = hamming_bucket_stats(hot, "h", "id", max_bucket_size=10).collect()
    assert len(rows) == 8  # one over-cap bucket per chunk position
    for r in rows:
        assert r["n"] == 30
        assert r["pairs_exact"] == 30 * 29 // 2
        assert r["pairs_suppressed"] == 30 * 29 // 2 - 10 * 9 // 2
    # diverse hashes under the cap: silence. Spread must cover ALL
    # chunks -- a generator bounded under 2^40 leaves the high chunks
    # constant-zero and every one of them hot
    def mix(i):
        v = (i + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
        return v - (1 << 64) if v >= (1 << 63) else v

    ok = spark.createDataFrame(
        [(i, mix(i)) for i in range(30)], "id bigint, h bigint"
    )
    assert hamming_bucket_stats(ok, "h", "id", max_bucket_size=10).count() == 0
