"""Audio fingerprint near-dup (r12): the Haitsma-Kalker-shape
energy-difference fingerprint over the stub decode seam, riding the
same capped pigeonhole join as the image and simhash families -- plus
the composed media curation e2e (dedup -> canonical -> ANN index)."""

from pyspark.sql import functions as F

from pg_auto_dw_spark.functions.dedup import connected_components
from pg_auto_dw_spark.functions.multimodal import (
    _dhash64,
    _gray_grid,
    audio_fingerprints,
    audio_near_dup_pairs,
)
from tests.test_multimodal_phash import _edited, _payload


def _noise(seed: int, n: int) -> bytes:
    # structure-free bytes (sha256 chain). The arithmetic _payload
    # generator makes every seed a near-TONE-SHIFT of every other
    # (constant seed*37 offset), and dHash is brightness-shift
    # invariant BY DESIGN -- several fixture drafts proved it by
    # accident. 'Unrelated' content must be structurally unrelated,
    # not just offset.
    import hashlib

    out = b""
    block = str(seed).encode()
    while len(out) < n:
        block = hashlib.sha256(block).digest()
        out += block
    return out[:n]


def _audio(spark, rows):
    return spark.createDataFrame(
        [(i, "audio", p, None) for i, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )


def test_fingerprint_locality_and_pairing(spark):
    base = _payload(11)
    media = _audio(
        spark,
        [(1, base), (2, base), (3, _edited(base)), (4, _payload(77)), (5, None)],
    )
    fps = {r["media_id"]: r["afp"] for r in audio_fingerprints(media).collect()}
    assert set(fps) == {1, 2, 3, 4, 5}
    assert fps[1] == fps[2] and fps[5] is None
    assert fps[1] == _dhash64(_gray_grid(base, 65, 1), w=65, h=1)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dup_pairs(media).collect()
    }
    assert pairs[(1, 2)] == 0
    # an 8-byte edit moves ~1 of 65 envelope cells: still within the
    # hamming budget (possibly 0 -- the coarse envelope absorbs it)
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert not any(4 in p or 5 in p for p in pairs)
    # a broad re-tone (a third of the payload) flips envelope gradient
    # bits without destroying the rest: near, but measurably different
    big_edit = base[:240] + bytes((x + 80) % 256 for x in base[240:480]) + base[480:]
    fp2 = {
        r["media_id"]: r["afp"]
        for r in audio_fingerprints(_audio(spark, [(1, base), (2, big_edit)])).collect()
    }
    flipped = bin((fp2[1] ^ fp2[2]) & ((1 << 64) - 1)).count("1")
    assert 0 < flipped < 32


def test_image_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, "image", _payload(1), None), (2, "audio", _payload(1), None)],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    assert {r["media_id"] for r in audio_fingerprints(df).collect()} == {2}


def test_media_curation_e2e(spark, tmp_path):
    """The composed media pipeline, end to end on one frame: perceptual
    dedup -> connected-components canonical (min id survives) -> the
    media->ANN bridge indexes ONLY canonicals -> a search for a dropped
    duplicate's embedding returns its surviving canonical on top."""
    from pg_auto_dw_spark.functions.multimodal import (
        embed_media,
        image_near_dup_pairs,
    )
    from pg_auto_dw_spark.functions.similarity import build_ivf_index, ivf_search_index
    from pg_auto_dw_spark.warehouse import Warehouse

    base_a, base_b = _payload(21), _payload(99)
    media = spark.createDataFrame(
        [(1, "image", base_a, None), (2, "image", _edited(base_a), None),
         (3, "image", base_a, None), (10, "image", base_b, None)],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    pairs = image_near_dup_pairs(media)
    comp = connected_components(
        pairs.select("id_a", "id_b"), nodes=media.select("media_id"),
        id_col="media_id",
    )
    canon = comp.filter(F.col("media_id") == F.col("cluster_id")).select("media_id")
    survivors = media.join(canon, "media_id", "left_semi")
    assert {r["media_id"] for r in survivors.select("media_id").collect()} == {1, 10}

    emb = embed_media(survivors).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_ivf_index(wh, emb, "mediaix", stride=1, iters=1, dims=64)
    # the dropped duplicate (id 2) queries the canonical index
    qvec = embed_media(media.filter(F.col("media_id") == 2)).first()["embedding"]
    hits = ivf_search_index(wh, "mediaix", [(0, qvec)], k=1, n_probes=10).collect()
    assert hits and hits[0]["neighbor_id"] == 1


def test_video_near_dup_frames(spark):
    """r12: video near-dup -- frame-grain perceptual hashes, the shared
    capped pigeonhole join over packed (video, frame) keys, and the
    evidence-count verdict (>= min_shared_frames matching frames)."""
    from pg_auto_dw_spark.functions.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    base = _payload(31, n=1600)
    # replace one scene with unrelated content: the covered frame
    # slices change structurally, the rest stay byte-identical
    scene_edit = base[:600] + _noise(777, 400) + base[1000:]
    rows = [(1, base), (2, scene_edit), (3, base), (4, _noise(500, 1600)),
            (5, None)]
    media = spark.createDataFrame(
        [(i, "video", p, None) for i, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    fh = video_frame_hashes(media, max_frames=8).collect()
    per_vid = {}
    for r in fh:
        per_vid.setdefault(r["media_id"], []).append(r)
    assert set(per_vid) == {1, 2, 3, 4}  # NULL payload emits nothing
    assert all(len(v) == 8 for v in per_vid.values())

    pairs = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_near_dup_pairs(media, max_frames=8).collect()
    }
    assert pairs[(1, 3)] >= 8  # identical videos: every frame matches
    # the scene edit leaves the untouched frames matching
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert pairs[(1, 2)] < pairs[(1, 3)]
    assert not any(4 in p for p in pairs)  # unrelated never pairs

    # one matching frame is NOT a near-dup verdict: raise the evidence
    # floor above the identical-frame count of the scene-edited pair
    strict = video_near_dup_pairs(
        media, max_frames=8, min_shared_frames=pairs[(1, 2)] + 1
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in strict}
    assert (1, 3) in got and (1, 2) not in got


def test_flat_frame_suppression(spark):
    """r12: min_spread drops structureless frames -- a half-blank video
    emits only its structured half, and two videos sharing ONLY blank
    sections never pair with suppression on."""
    from pg_auto_dw_spark.functions.multimodal import (
        video_frame_hashes,
        video_near_dup_pairs,
    )

    half_blank_a = _noise(41, 800) + bytes(800)  # frames 4..7 flat
    half_blank_b = _noise(900, 800) + bytes(800)
    media = spark.createDataFrame(
        [(1, "video", half_blank_a, None), (2, "video", half_blank_b, None)],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    all_frames = video_frame_hashes(media, max_frames=8).collect()
    kept = video_frame_hashes(media, max_frames=8, min_spread=5).collect()
    assert len(all_frames) == 16
    assert len(kept) == 8 and all(r["frame_no"] < 4 for r in kept)
    # the two videos share only their blank halves: suppression on ->
    # nothing pairs; suppression off -> the blank frames cross-match
    on = video_near_dup_pairs(media, max_frames=8, min_spread=5).collect()
    assert on == []
    off = video_near_dup_pairs(media, max_frames=8).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in off)
