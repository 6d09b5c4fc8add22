"""Media landing zone (streaming/jobs.py media_ingest_apply +
media_ingest_stream, r12 VERDICT directive 5): cross-batch
perceptual-hash dedup against the persisted phash/chunks ledger pair,
probed with the zero-ledger-shuffle join direction -- the media twin
of the MinHash text zone."""

import random

from pyspark.sql import types as T

from pg_auto_dw_spark.streaming.jobs import media_ingest_apply, media_ingest_stream
from pg_auto_dw_spark.warehouse import Warehouse


def _payload(seed: int, n: int = 720) -> bytes:
    return bytes((seed * 37 + i * 11 + (i * i) % 31) % 256 for i in range(n))


def _edited(b: bytes, at: int = 100, span: int = 8) -> bytes:
    # local re-tone: the near-dup shape a re-encode produces
    return b[:at] + bytes((x + 40) % 256 for x in b[at : at + span]) + b[at + span :]


def _noise(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, t, p, None) for i, t, p in rows],
        "media_id bigint, media_type string, payload binary, meta string",
    )


IMG = _payload(1)
AUD = _payload(2, 650)
VID = _noise(3, 1600)
VID_SCENE = VID[:600] + _noise(99, 400) + VID[1000:]  # shares most frames


def test_within_batch_collapse(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [
            (1, "image", IMG), (2, "image", _edited(IMG)),
            (3, "image", _noise(50, 720)),
            (10, "audio", AUD), (11, "audio", _edited(AUD)),
            (20, "video", VID), (21, "video", VID_SCENE),
        ]),
    )
    assert stats["n_batch"] == 7
    assert stats["n_within_dups"] == 3  # one per family
    assert stats["n_cross_dups"] == 0 and stats["n_new"] == 4
    kept = {r["media_id"] for r in wh.read("m.corpus").collect()}
    assert kept == {1, 3, 10, 20}  # min-id canonicals survive
    # ledger rows exist only for admitted media, in both sidecars
    assert {r["media_id"] for r in wh.read("m.corpus.phash").collect()} == kept
    assert {r["media_id"] for r in wh.read("m.corpus.chunks").collect()} == kept


def test_cross_batch_media_dup_dropped(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [(1, "image", IMG), (2, "audio", AUD), (3, "video", VID)]),
    )
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [
            (10, "image", _edited(IMG)),      # re-encode of corpus image 1
            (11, "audio", _edited(AUD)),      # re-encode of corpus audio 2
            (12, "video", VID_SCENE),         # scene edit of corpus video 3
            (13, "image", _noise(77, 720)),   # genuinely new
        ]),
        dupes_table="m.dupes",
    )
    assert stats["n_cross_dups"] == 3 and stats["n_new"] == 1
    kept = {r["media_id"] for r in wh.read("m.corpus").collect()}
    assert kept == {1, 2, 3, 13}
    dupes = {r["media_id"]: r["matched_id"] for r in wh.read("m.dupes").collect()}
    assert dupes == {10: 1, 11: 2, 12: 3}
    # a THIRD wave resubmitting a near-copy is still caught (ledger
    # grew by batch 2's survivor, not its dups)
    stats3 = media_ingest_apply(
        wh, "m.corpus", _media(spark, [(30, "image", _edited(IMG, at=200))])
    )
    assert stats3["n_cross_dups"] == 1 and stats3["n_new"] == 0


def test_video_evidence_threshold(spark, tmp_path):
    """One matching frame is NOT a cross-batch video verdict: a video
    sharing a single scene with the corpus is admitted at the default
    min_shared_frames=2, dropped at 1."""
    one_scene = _noise(500, 1500) + VID[:100]  # shares only a frame or so
    for msf, expect_new in ((2, 1), (1, 0)):
        wh = Warehouse(spark, str(tmp_path / f"wh{msf}"))
        media_ingest_apply(wh, "m.corpus", _media(spark, [(1, "video", VID)]))
        stats = media_ingest_apply(
            wh, "m.corpus", _media(spark, [(9, "video", one_scene)]),
            min_shared_frames=msf,
        )
        assert stats["n_new"] == expect_new, f"min_shared_frames={msf}"


def test_unsigned_media_admitted_unchecked(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [(1, "image", IMG), (2, "image", None), (3, "audio", b"")]),
    )
    assert stats["n_unsigned"] == 2 and stats["n_new"] == 3
    assert wh.read("m.corpus").count() == 3
    # NULL/empty payloads leave NO ledger rows
    assert {r["media_id"] for r in wh.read("m.corpus.phash").collect()} == {1}


def test_media_types_never_cross_match(spark, tmp_path):
    """The same payload ingested as image and as audio must NOT pair:
    hashes live in per-family spaces."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(wh, "m.corpus", _media(spark, [(1, "image", IMG)]))
    stats = media_ingest_apply(wh, "m.corpus", _media(spark, [(2, "audio", IMG)]))
    assert stats["n_cross_dups"] == 0 and stats["n_new"] == 1


def test_media_stream_end_to_end(spark, tmp_path):
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run():
        q = media_ingest_stream(
            spark, str(src), schema, wh, "lz.media",
            str(tmp_path / "ckpt"), dupes_table="lz.dupes",
        )
        q.awaitTermination(120)

    _media(spark, [(1, "image", IMG), (2, "video", VID)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()
    assert wh.read("lz.media").count() == 2
    _media(spark, [
        (7, "image", _edited(IMG)), (8, "video", VID_SCENE),
        (9, "image", _noise(88, 720)),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    run()
    kept = {r["media_id"] for r in wh.read("lz.media").collect()}
    assert kept == {1, 2, 9}  # re-encodes dropped, new image admitted
    assert {r["media_id"]: r["matched_id"] for r in wh.read("lz.dupes").collect()} \
        == {7: 1, 8: 2}
    # restart over the same sources: exact no-op
    run()
    assert wh.read("lz.media").count() == 3
    assert wh.read("lz.dupes").count() == 2


def test_media_hash_rows_one_pass_matches_family_kernels(spark):
    """The one-pass dispatch kernel must be row-identical to the
    three family kernels' union -- the hash math is shared by
    construction, this pins the dispatch/suppression plumbing."""
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.multimodal import (
        audio_fingerprints,
        media_hash_rows,
        perceptual_hashes,
        video_frame_hashes,
    )

    media = _media(spark, [
        (1, "image", IMG), (2, "image", None), (3, "image", b""),
        (10, "audio", AUD), (11, "audio", _edited(AUD)),
        (20, "video", VID), (21, "video", VID_SCENE), (22, "video", b""),
    ])
    for ms in (0, 5):
        got = {
            (r["media_id"], r["media_type"], r["frame_no"], r["mhash"])
            for r in media_hash_rows(media, min_spread=ms).collect()
        }
        want = set()
        for r in perceptual_hashes(media, min_spread=ms).collect():
            if r["dhash"] is not None:
                want.add((r["media_id"], "image", 0, r["dhash"]))
        for r in audio_fingerprints(media, min_spread=ms).collect():
            if r["afp"] is not None:
                want.add((r["media_id"], "audio", 0, r["afp"]))
        for r in video_frame_hashes(media, min_spread=ms).collect():
            want.add((r["media_id"], "video", r["frame_no"], r["fhash"]))
        assert got == want and got, f"min_spread={ms}"


def test_zone_monitor_table_composed(spark, tmp_path):
    """monitor_table lands the over-cap bucket audit in the SAME
    transaction: a blank-block batch writes saturation rows, a healthy
    batch writes none, and verdicts are identical with the monitor on
    or off."""
    flat = bytes([128]) * 720
    blanky = [(i, "image", flat) for i in range(1, 20)] + [(100, "image", IMG)]
    for monitored in (False, True):
        wh = Warehouse(spark, str(tmp_path / f"wh{monitored}"))
        stats = media_ingest_apply(
            wh, "m.corpus", _media(spark, blanky),
            max_probe_bucket=8,
            monitor_table="m.buckets" if monitored else None,
        )
        if monitored:
            mon = wh.read("m.buckets").collect()
            assert mon and all(r["n"] > 8 for r in mon)
            assert {r["media_type"] for r in mon} == {"image"}
            base_stats = stats
        else:
            off_stats = stats
    assert base_stats == off_stats  # monitoring never changes verdicts
    # healthy batch: zero monitor rows appended
    wh = Warehouse(spark, str(tmp_path / "whTrue"))
    media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [(200, "image", _noise(7, 720)), (201, "audio", AUD)]),
        max_probe_bucket=8, monitor_table="m.buckets",
    )
    assert wh.read("m.buckets").count() == len(mon)  # unchanged


def test_media_zone_maintenance_loop(spark, tmp_path):
    """The maintenance cadence, composed for the media zone: N
    single-file micro-batches accrete small-file pressure on the
    corpus and BOTH hash sidecars, the wired-in maybe_compact trigger
    fires, and every table reads identically with collapsed files."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run_batch(i: int):
        _media(spark, [(i, "image", _noise(1000 + i, 720))]).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q = media_ingest_stream(
            spark, str(src), schema, wh, "lz.media", str(tmp_path / "ckpt"),
            maintenance_every=1,
            maintenance_kwargs={"max_small_files": 3, "small_file_mb": 1},
        )
        q.awaitTermination(120)

    n_batches = 8
    for i in range(n_batches):
        run_batch(i)

    media = wh.read("lz.media")
    assert sorted(r["media_id"] for r in media.collect()) == list(range(n_batches))
    actions = [h["action"] for h in wh.history("lz.media")]
    assert "overwrite" in actions  # the compaction trigger fired
    for t in ("lz.media", "lz.media.phash", "lz.media.chunks"):
        health = wh.table_health(t, small_file_mb=1)
        assert health["files"] < n_batches, t
    assert wh.read("lz.media.phash").count() == n_batches
    assert wh.read("lz.media.chunks").count() == n_batches * 8  # 8 chunks/hash


def test_media_transaction_is_all_or_nothing(spark, tmp_path, monkeypatch):
    """A failure while staging ANY of the three tables (corpus, phash,
    chunks) must leave the warehouse at the prior batch's state -- a
    chunk row without its media row would silently eat future
    near-copies of media that was never admitted."""
    import pg_auto_dw_spark.warehouse as wh_mod

    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(wh, "m.corpus", _media(spark, [(1, "image", IMG)]))
    before = {
        t: {tuple(r) for r in wh.read(t).collect()}
        for t in ("m.corpus", "m.corpus.phash", "m.corpus.chunks")
    }

    real_append = wh_mod._Transaction.append

    def boom(self, name, df):
        if name == "m.corpus.chunks":
            raise RuntimeError("injected crash while staging chunk keys")
        return real_append(self, name, df)

    monkeypatch.setattr(wh_mod._Transaction, "append", boom)
    try:
        media_ingest_apply(wh, "m.corpus", _media(spark, [(9, "audio", AUD)]))
        raise AssertionError("expected the injected failure to propagate")
    except RuntimeError:
        pass
    monkeypatch.setattr(wh_mod._Transaction, "append", real_append)
    wh2 = Warehouse(spark, str(tmp_path / "wh"))  # recovery runs at init
    for t, rows in before.items():
        assert {tuple(r) for r in wh2.read(t).collect()} == rows, t
    # and the aborted batch simply retries
    stats = media_ingest_apply(wh2, "m.corpus", _media(spark, [(9, "audio", AUD)]))
    assert stats["n_new"] == 1


def test_media_bucketed_sidecars_same_verdicts_and_loud_mismatch(spark, tmp_path):
    """Opt-in partitioned sidecars (n_sidecar_parts) must produce the
    SAME dedup verdicts as the default layout, and a layout-mismatched
    call must fail loudly instead of silently mis-probing."""
    import pytest

    batches = [
        [(1, "image", IMG), (2, "audio", AUD), (3, "video", VID)],
        [(10, "image", _edited(IMG)), (11, "audio", _edited(AUD)),
         (12, "video", VID_SCENE), (13, "image", _noise(66, 720))],
        [(30, "image", _edited(IMG, at=300)), (31, "audio", _noise(67, 650))],
    ]
    results = {}
    for parts in (None, 64):
        wh = Warehouse(spark, str(tmp_path / f"wh{parts}"))
        stats = [
            media_ingest_apply(
                wh, "m.corpus", _media(spark, b), n_sidecar_parts=parts
            )
            for b in batches
        ]
        kept = sorted(r["media_id"] for r in wh.read("m.corpus").collect())
        results[parts] = (stats, kept)
        if parts:
            # the partitioned layout actually materialized
            assert "__bucket" in wh.read("m.corpus.chunks").columns
            assert "__bucket" in wh.read("m.corpus.phash").columns
    assert results[None] == results[64]  # bitwise-identical verdicts
    # loud mismatch both directions
    wh = Warehouse(spark, str(tmp_path / "wh64"))
    with pytest.raises(ValueError, match="layout mismatch"):
        media_ingest_apply(wh, "m.corpus", _media(spark, [(99, "image", IMG)]))
    wh = Warehouse(spark, str(tmp_path / "whNone"))
    with pytest.raises(ValueError, match="layout mismatch"):
        media_ingest_apply(
            wh, "m.corpus", _media(spark, [(99, "image", IMG)]),
            n_sidecar_parts=64,
        )


def test_media_stream_maintains_ndv(spark, tmp_path):
    """ndv_cols composition on the media front door: <corpus>.ndv stays
    current across micro-batches, estimates exact at this cardinality."""
    from pg_auto_dw_spark.functions.sketch import ndv_estimates

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))

    def run():
        q = media_ingest_stream(
            spark, str(src), schema, wh, "lz.media",
            str(tmp_path / "ckpt"), ndv_cols=["media_type", "media_id"],
        )
        q.awaitTermination(120)

    _media(spark, [(i, "image", _noise(300 + i, 720)) for i in range(5)]) \
        .coalesce(1).write.mode("append").parquet(str(src))
    run()
    _media(spark, [(i, "audio", _noise(400 + i, 650)) for i in range(5, 9)]) \
        .coalesce(1).write.mode("append").parquet(str(src))
    run()
    est = {
        r["col_name"]: r["n_distinct"]
        for r in ndv_estimates(wh.read("lz.media.ndv")).collect()
    }
    assert est == {"media_type": 2, "media_id": 9}


def test_hash_config_fixed_at_first_ingest(spark, tmp_path):
    """r13 review fix: the hash KEY SPACE (n_chunks/max_frames/
    min_spread) is pinned at first ingest -- a later call with
    different knobs would probe a different key space and silently
    admit every near-copy, so it must fail loudly instead."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(wh, "m.corpus", _media(spark, [(1, "image", IMG)]))
    for bad in ({"n_chunks": 4}, {"max_frames": 8}, {"min_spread": 5}):
        with pytest.raises(ValueError, match="hashing-config mismatch"):
            media_ingest_apply(
                wh, "m.corpus", _media(spark, [(2, "image", IMG)]), **bad
            )
    # same knobs still ingest fine, and the guard rides the ledger
    stats = media_ingest_apply(wh, "m.corpus", _media(spark, [(2, "audio", AUD)]))
    assert stats["n_new"] == 1
    with pytest.raises(ValueError, match="max_frames must be"):
        media_ingest_apply(
            wh, "m2.corpus", _media(spark, [(1, "video", VID)]),
            max_frames=1 << 20,
        )


def test_monitor_table_exists_from_first_ingest(spark, tmp_path):
    """r13 review fix: with monitoring enabled, the audit table exists
    (empty) from the first healthy batch -- a consumer can always read
    it, and empty means healthy rather than monitoring-off."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(
        wh, "m.corpus", _media(spark, [(1, "image", IMG)]),
        monitor_table="m.buckets",
    )
    assert wh.exists("m.buckets") and wh.read("m.buckets").count() == 0


def test_hashcfg_pin_survives_first_batch_crash(spark, tmp_path, monkeypatch):
    """r13 ADVICE (medium): the cfg table is created OUTSIDE the ingest
    transaction, so a FIRST-batch crash between create_table and the
    txn commit used to leave it existing-but-empty -- every retry then
    hit collect()[0] -> IndexError, and the pin row could never be
    written again (the append was keyed off table existence),
    permanently disabling the key-space guard. The guard now keys off
    ROW presence: the retry must succeed AND the pin must land."""
    import pytest

    import pg_auto_dw_spark.warehouse as wh_mod

    wh = Warehouse(spark, str(tmp_path / "wh"))
    real_append = wh_mod._Transaction.append

    def boom(self, name, df):
        if name == "m.corpus.chunks":
            raise RuntimeError("injected first-batch crash")
        return real_append(self, name, df)

    monkeypatch.setattr(wh_mod._Transaction, "append", boom)
    with pytest.raises(RuntimeError, match="injected first-batch crash"):
        media_ingest_apply(
            wh, "m.corpus", _media(spark, [(1, "image", IMG)]), n_chunks=16
        )
    monkeypatch.setattr(wh_mod._Transaction, "append", real_append)
    # the crash window: cfg table exists but carries no committed row
    wh2 = Warehouse(spark, str(tmp_path / "wh"))  # recovery runs at init
    assert wh2.exists("m.corpus.hashcfg")
    assert wh2.read("m.corpus.hashcfg").count() == 0
    # retry with the same knobs: no IndexError, pin row lands this time
    stats = media_ingest_apply(
        wh2, "m.corpus", _media(spark, [(1, "image", IMG)]), n_chunks=16
    )
    assert stats["n_new"] == 1
    cfg = wh2.read("m.corpus.hashcfg").collect()
    assert len(cfg) == 1 and cfg[0]["n_chunks"] == 16
    # and the guard is actually armed: a knob change now fails loudly
    with pytest.raises(ValueError, match="hashing-config mismatch"):
        media_ingest_apply(
            wh2, "m.corpus", _media(spark, [(2, "image", IMG)]), n_chunks=8
        )


def test_hashcfg_guard_holds_across_reopened_warehouse(spark, tmp_path):
    """r13 VERDICT directive 8: the key-space pin must protect the
    COLD-START path -- a fresh Warehouse handle on the same store (new
    process, new session) with mismatched knobs must fail loudly, not
    just a second call within the session that wrote the pin."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(
        wh, "m.corpus", _media(spark, [(1, "image", IMG)]),
        n_chunks=16, max_frames=8, min_spread=2,
    )
    reopened = Warehouse(spark, str(tmp_path / "wh"))
    for bad in ({"n_chunks": 8}, {"max_frames": 16}, {"min_spread": 0}):
        knobs = {"n_chunks": 16, "max_frames": 8, "min_spread": 2, **bad}
        with pytest.raises(ValueError, match="hashing-config mismatch"):
            media_ingest_apply(
                reopened, "m.corpus", _media(spark, [(2, "image", IMG)]),
                **knobs,
            )
    # matched knobs ingest fine through the reopened handle
    stats = media_ingest_apply(
        reopened, "m.corpus", _media(spark, [(2, "audio", AUD)]),
        n_chunks=16, max_frames=8, min_spread=2,
    )
    assert stats["n_new"] == 1


def test_within_batch_members_routed_to_dupes(spark, tmp_path):
    """r13 ADVICE: within-batch cluster MEMBERS get dupes lineage too.
    matched_id must always name a row present in the corpus table --
    the admitted canonical for a batch-only cluster, and the corpus
    witness (transitively) when the canonical itself cross-matched."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(wh, "m.corpus", _media(spark, [(1, "image", IMG)]))
    # batch: a 3-cluster whose canonical (10) cross-matches corpus 1,
    # and a batch-only 2-cluster (30 canonical, 31 member)
    other = _noise(88, 720)
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [
            (10, "image", _edited(IMG)), (11, "image", _edited(IMG, at=300)),
            (12, "image", _edited(IMG, at=500)),
            (30, "image", other), (31, "image", _edited(other)),
        ]),
        dupes_table="m.dupes",
    )
    assert stats["n_within_dups"] == 3  # 11, 12, 31
    assert stats["n_cross_dups"] == 1   # canonical 10
    assert stats["n_new"] == 1          # canonical 30
    lineage = {
        r["media_id"]: r["matched_id"] for r in wh.read("m.dupes").collect()
    }
    # every dropped row has lineage, pointing at a SURVIVING corpus row
    assert lineage == {10: 1, 11: 1, 12: 1, 31: 30}
    kept = {r["media_id"] for r in wh.read("m.corpus").collect()}
    assert set(lineage.values()) <= kept


def test_negative_media_id_rejected(spark, tmp_path):
    """r13 ADVICE: the packed pair key decodes with a truncating div,
    so a negative media_id would silently corrupt same-video filtering
    -- the front door rejects it before any ledger state changes."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="media_id >= 0"):
        media_ingest_apply(
            wh, "m.corpus", _media(spark, [(-1, "image", IMG)])
        )
    assert not wh.exists("m.corpus")


def test_overwide_media_id_rejected(spark, tmp_path):
    """r14 ADVICE: ids past 2^43-1 silently WRAP the packed non-ANSI
    long multiply (media_id * 2^20 + frame_no) -- the same corruption
    as a negative id, so the same one-agg-pass front door rejects it.
    2^43 exactly is the first unsafe value; 2^43-1 must pass."""
    import pytest

    from pg_auto_dw_spark.functions.multimodal import _MAX_PACKABLE_ID

    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="wrap the"):
        media_ingest_apply(
            wh, "m.corpus",
            _media(spark, [(_MAX_PACKABLE_ID + 1, "image", IMG)]),
        )
    assert not wh.exists("m.corpus")
    # the boundary id itself is packable and admits cleanly
    stats = media_ingest_apply(
        wh, "m.corpus", _media(spark, [(_MAX_PACKABLE_ID, "image", IMG)])
    )
    assert stats["n_new"] == 1


def test_media_sidecar_parts_rule_arithmetic():
    """r13 VERDICT directive 4: the parts-sizing rule encodes the XL
    probe's measured decision table, and its coverage-gate arithmetic
    matches the apply's <=0.8 prune test."""
    from pg_auto_dw_spark.streaming.jobs import media_sidecar_parts_rule

    # below the measured ~10M-chunk-row crossover flat wins: no parts
    assert media_sidecar_parts_rule(228_064, 100) is None
    assert media_sidecar_parts_rule(9_999_999, 100) is None
    # at the measured crossover, a 100-media batch (K = 800 probe keys)
    # fits 512 parts: expected coverage 1-(511/512)^800 = 0.791 < 0.8
    assert media_sidecar_parts_rule(22_463_200, 100) == 512
    exp = 512 * (1.0 - (1.0 - 1.0 / 512) ** 800)
    assert exp <= 0.8 * 512 < 512 * (1.0 - (1.0 - 1.0 / 512) ** 900)
    # a 4x batch needs 4x the parts to clear the same gate
    assert media_sidecar_parts_rule(22_463_200, 400) == 2048
    # key-space saturation (the ~45x correction): 5k videos x 16 frames
    # probe min(640k, 6144) = the WHOLE 6144-point chunk-key space --
    # no parts count under the metadata-storm cap can clear the gate,
    # so the rule says shrink batches, not grow parts
    assert media_sidecar_parts_rule(22_463_200, 5_000, avg_frames=16) is None
    # the fixed key space itself: 3 types x 8 positions x 2^8 values
    assert media_sidecar_parts_rule(
        22_463_200, 10_000_000
    ) is None  # even an absurd batch count saturates at 6144 keys


def test_media_quality_gate_rejects_and_routes(spark, tmp_path):
    """r14: the media twin of the text zone's quality gate. min_bytes
    rejects tiny/NULL payloads before the hash pass; reject_unsigned
    flips the admitted-unchecked convention; rejected rows land
    verbatim + reject_reason in the SAME transaction."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    flat = bytes([50] * 700)  # constant tone: unsigned under min_spread
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [
            (1, "image", IMG),                # clean
            (2, "image", b"tiny"),            # under the byte floor
            (3, "image", None),               # NULL payload
            (4, "audio", flat),               # silence -> unsigned
        ]),
        min_spread=5,
        rejected_table="m.rejected",
        min_bytes=64,
        reject_unsigned=True,
    )
    assert stats["n_batch"] == 4
    assert stats["n_new"] == 1 and stats["n_rejected"] == 3
    assert stats["n_unsigned"] == 1  # the silence row, counted then routed
    kept = {r["media_id"] for r in wh.read("m.corpus").collect()}
    assert kept == {1}
    rej = {r["media_id"]: r["reject_reason"] for r in wh.read("m.rejected").collect()}
    assert rej == {2: "min_bytes", 3: "min_bytes", 4: "unsigned"}
    # ledger rows only for the admitted row
    assert {r["media_id"] for r in wh.read("m.corpus.phash").collect()} == {1}


def test_media_quality_gate_empty_table_means_healthy(spark, tmp_path):
    """The rejected table exists (empty) from the first gated batch --
    a consumer can always read it; empty means healthy, not gate-off."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = media_ingest_apply(
        wh, "m.corpus", _media(spark, [(1, "image", IMG)]),
        rejected_table="m.rejected", min_bytes=8,
    )
    assert stats["n_rejected"] == 0
    assert wh.exists("m.rejected") and wh.read("m.rejected").count() == 0


def test_media_quality_gate_without_table_raises(spark, tmp_path):
    """A gate knob without a rejected_table is a silently-disabled
    gate: fail loudly (the text zone's rule)."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for bad in ({"min_bytes": 64}, {"reject_unsigned": True}):
        with pytest.raises(ValueError, match="rejected_table"):
            media_ingest_apply(
                wh, "m.corpus", _media(spark, [(1, "image", IMG)]), **bad
            )
    assert not wh.exists("m.corpus")


def test_media_quality_gate_off_is_legacy(spark, tmp_path):
    """Gate off (default) = bitwise-legacy: unsigned rows admitted
    unchecked, no n_rejected key, no rejected table."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [(1, "image", IMG), (2, "image", None)]),
    )
    assert "n_rejected" not in stats
    assert stats["n_unsigned"] == 1 and stats["n_new"] == 2
    assert {r["media_id"] for r in wh.read("m.corpus").collect()} == {1, 2}


def test_media_decode_rules_gate(spark, tmp_path):
    """r15 (r14 VERDICT #5): structural decode floors -- the media
    counterpart of the text zone's Gopher rules. Width/height rules
    apply only where the decode reports a dimension (audio passes a
    width floor), the frame floor applies everywhere, the reason
    names the FIRST failing rule, and sub-floor media never reaches
    the ledger. The frame floor is a duration floor for TIME-BASED
    media only: a static image (1 frame by construction) passes it.
    Stub decode arithmetic: image width = 16 + n%624,
    height = 16 + 7n%464; audio frames = 1 + n%1000; video frames =
    1 + n%120 (functions/multimodal.py _fake_decode)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stats = media_ingest_apply(
        wh, "m.corpus",
        _media(spark, [
            # n=700: width 16+76=92 >= 90, height 16+(4900%464)=276: clean
            (1, "image", _noise(11, 700)),
            # n=50: width 66 < 90 AND height 366 >= 100 -> min_width
            (2, "image", _noise(12, 50)),
            # n=636: width 28 < 90, height 16+(4452%464)=280 -> first
            # failing rule is min_width even with a height rule set
            (3, "image", _noise(13, 636)),
            # audio: width NULL -> width rule does NOT apply; frames
            # 1 + 700%1000 = 701 >= 10: clean
            (4, "audio", _noise(14, 700)),
            # audio n=1005: frames 6 < 10 -> min_frames
            (5, "audio", _noise(15, 1005)),
            # video n=240: frames 1 + 240%120 = 1 < 10 -> min_frames
            (6, "video", _noise(16, 240)),
        ]),
        rejected_table="m.rejected",
        decode_rules={"min_width": 90, "min_height": 100, "min_frames": 10},
    )
    assert stats["n_batch"] == 6
    assert stats["n_rejected"] == 4 and stats["n_new"] == 2
    kept = {r["media_id"] for r in wh.read("m.corpus").collect()}
    assert kept == {1, 4}
    rej = {r["media_id"]: r["reject_reason"]
           for r in wh.read("m.rejected").collect()}
    assert rej == {
        2: "decode:min_width",
        3: "decode:min_width",
        5: "decode:min_frames",
        6: "decode:min_frames",
    }
    # sub-floor media never reached the ledger
    assert {r["media_id"] for r in wh.read("m.corpus.phash").collect()} <= {1, 4}


def test_media_decode_rules_unknown_key_and_no_table(spark, tmp_path):
    """A typo'd rule key or a missing rejected_table is the same quiet
    gate failure: both raise before any state changes."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="unknown rule keys"):
        media_ingest_apply(
            wh, "m.corpus", _media(spark, [(1, "image", IMG)]),
            rejected_table="m.rejected",
            decode_rules={"min_widht": 90},
        )
    with pytest.raises(ValueError, match="rejected_table"):
        media_ingest_apply(
            wh, "m.corpus", _media(spark, [(1, "image", IMG)]),
            decode_rules={"min_width": 90},
        )
    assert not wh.exists("m.corpus")


def test_incremental_assembly_matches_batch_mode(spark, tmp_path):
    """r14 VERDICT #7: media-text assembly per-ingest against the
    zone's OWN ledger (media_zone_cluster_assignments over
    corpus + dupes -- zero re-hash) equals the batch-mode
    media_dup_clusters assembly over the union, on a direct-twin
    corpus ingested in id order (where the zone's star clustering and
    batch CC provably coincide). Captions of dropped twins re-point
    to the surviving canonical on both paths."""
    from pg_auto_dw_spark.functions.multimodal import (
        assemble_media_text_pairs,
        media_dup_clusters,
    )
    from pg_auto_dw_spark.streaming.jobs import (
        media_zone_cluster_assignments,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    img_a, img_b = _noise(21, 700), _noise(22, 700)
    batches = [
        [(1, "image", img_a), (2, "image", img_b)],
        [(3, "image", _edited(img_a))],                    # twin of 1
        [(4, "image", _edited(img_b, at=200)),             # twin of 2
         (5, "image", _noise(23, 650))],                   # fresh
    ]
    all_rows = []
    for b in batches:
        media_ingest_apply(
            wh, "z.corpus", _media(spark, b), dupes_table="z.dupes"
        )
        all_rows += b
    docs = spark.createDataFrame(
        [(100 + i, f"caption for media {i}") for i in range(1, 6)],
        "doc_id bigint, text string",
    )
    links = spark.createDataFrame(
        [(i, 100 + i) for i in range(1, 6)],
        "media_id bigint, doc_id bigint",
    )
    zone_clusters = media_zone_cluster_assignments(wh, "z.corpus", "z.dupes")
    inc = assemble_media_text_pairs(docs, links, zone_clusters).collect()
    batch_clusters = media_dup_clusters(
        _media(spark, all_rows), semantic_threshold=None,
        media_types=("image",),
    )
    full = assemble_media_text_pairs(docs, links, batch_clusters).collect()
    assert sorted(map(tuple, inc)) == sorted(map(tuple, full))
    # dropped twin 3's caption follows canonical 1; twin 4's follows 2
    repointed = {(r["media_id"], r["doc_id"]) for r in inc}
    assert (1, 103) in repointed and (2, 104) in repointed
    assert not any(m in (3, 4) for m, _ in repointed)
    # the facade's media_clusters plug-in (r15): zone assignments ride
    # the one-call chain without the corpus-scale re-hash, same pairs
    from pg_auto_dw_spark.functions.multimodal import (
        curate_media_text_corpus,
    )

    media_union = _media(spark, all_rows)
    via_zone = curate_media_text_corpus(
        media_union, docs, links, media_clusters=zone_clusters,
        min_alignment=None,
    )
    via_batch = curate_media_text_corpus(
        media_union, docs, links, semantic_threshold=None,
        media_types=("image",), min_alignment=None,
    )
    cols = ["media_id", "doc_id", "media_cluster", "pair_group", "split"]
    assert sorted(map(tuple, via_zone.select(*cols).collect())) == sorted(
        map(tuple, via_batch.select(*cols).collect())
    )


def test_media_quality_gate_through_stream(spark, tmp_path):
    """Gate kwargs ride the stream twin's passthrough; rejections land
    transactionally per micro-batch."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _media(spark, [(1, "image", IMG), (2, "image", b"x")]) \
        .coalesce(1).write.mode("append").parquet(str(src))
    q = media_ingest_stream(
        spark, str(src), schema, wh, "lz.media", str(tmp_path / "ckpt"),
        rejected_table="lz.rejected", min_bytes=64,
    )
    q.awaitTermination(120)
    assert {r["media_id"] for r in wh.read("lz.media").collect()} == {1}
    assert {r["media_id"] for r in wh.read("lz.rejected").collect()} == {2}


def test_decode_rules_and_assembly_through_stream(spark, tmp_path):
    """r15 composition: the decode-rules gate rides the stream twin's
    passthrough (sub-floor media rejected transactionally per
    micro-batch), and the zone's ledger immediately serves
    incremental assembly -- the full per-ingest curation loop with
    zero corpus re-hash."""
    from pg_auto_dw_spark.functions.multimodal import (
        assemble_media_text_pairs,
    )
    from pg_auto_dw_spark.streaming.jobs import (
        media_zone_cluster_assignments,
    )

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    img = _noise(31, 700)
    _media(spark, [
        (1, "image", img),
        (2, "image", _edited(img)),        # near-dup of 1: dropped
        (3, "video", _noise(32, 240)),     # 1 frame < floor: rejected
    ]).coalesce(1).write.mode("append").parquet(str(src))
    q = media_ingest_stream(
        spark, str(src), schema, wh, "lz.media", str(tmp_path / "ckpt"),
        dupes_table="lz.dupes",
        rejected_table="lz.rejected",
        decode_rules={"min_frames": 10},
    )
    q.awaitTermination(120)
    assert {r["media_id"] for r in wh.read("lz.media").collect()} == {1}
    rej = {r["media_id"]: r["reject_reason"]
           for r in wh.read("lz.rejected").collect()}
    assert rej == {3: "decode:min_frames"}
    # per-ingest assembly straight off the zone state: the dropped
    # twin's caption re-points to canonical 1; the rejected video's
    # caption keeps its own id (never ingested -> own cluster)
    docs = spark.createDataFrame(
        [(101, "cap one"), (102, "cap two"), (103, "cap three")],
        "doc_id bigint, text string",
    )
    links = spark.createDataFrame(
        [(1, 101), (2, 102), (3, 103)], "media_id bigint, doc_id bigint"
    )
    zc = media_zone_cluster_assignments(wh, "lz.media", "lz.dupes")
    pairs = {(r["media_id"], r["doc_id"])
             for r in assemble_media_text_pairs(docs, links, zc).collect()}
    assert pairs == {(1, 101), (1, 102), (3, 103)}


def test_zone_frame_costs_feed_packing(spark, tmp_path):
    """r15 composition: the phash ledger's frame counts are the
    vision-token cost source for interleaved packing -- a zone-fed
    corpus plans packing with zero decode passes, and the budgets
    match the per-family frame counts the zone sampled."""
    from pg_auto_dw_spark.functions.corpus import pack_multimodal_sequences
    from pg_auto_dw_spark.streaming.jobs import media_zone_frame_costs

    wh = Warehouse(spark, str(tmp_path / "wh"))
    media_ingest_apply(
        wh, "z.corpus",
        _media(spark, [
            (1, "image", _noise(41, 700)),
            (2, "video", _noise(42, 1600)),
        ]),
    )
    costs = media_zone_frame_costs(wh, "z.corpus")
    by_id = {r["media_id"]: r["n_frames"] for r in costs.collect()}
    assert by_id[1] == 1 and by_id[2] > 1  # image 1 frame, video many
    docs = spark.createDataFrame(
        [(101, "caption one"), (102, "caption two")],
        "doc_id bigint, text string",
    )
    links = spark.createDataFrame(
        [(1, 101), (2, 102)], "media_id bigint, doc_id bigint"
    )
    placed = pack_multimodal_sequences(
        docs, links, costs, seq_tokens=2048, tokens_per_frame=16
    ).collect()
    got = {(r["doc_id"], r["item_type"]): r["n_tokens"] for r in placed}
    assert got[(101, "media")] == 16 * by_id[1]
    assert got[(102, "media")] == 16 * by_id[2]


def test_embed_index_maintained_per_ingest(spark, tmp_path):
    """r15: embed_index wires incremental cross-modal index
    maintenance into the zone -- every ADMITTED row's embedding lands
    in the index's assignment table in the ingest transaction;
    dropped near-dups never enter; a direct-apply retry appends
    nothing; and a search over the maintained index finds a dropped
    copy's surviving canonical."""
    from pg_auto_dw_spark.functions.multimodal import embed_media
    from pg_auto_dw_spark.functions.retrieval import ivf_search_frame
    from pg_auto_dw_spark.functions.similarity import build_ivf_index
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path / "wh"))
    img_a, img_b = _noise(51, 700), _noise(52, 700)
    # pre-build the index from an initial embedded corpus (the
    # build-once contract; training needs vectors)
    seed = _media(spark, [(1, "image", img_a), (2, "image", img_b)])
    vecs = embed_media(seed, dims=32).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )
    build_ivf_index(wh, vecs, "xm", stride=2, dims=32)
    media_ingest_apply(wh, "z.corpus", seed, embed_index="xm")
    assert {r["vec_id"] for r in wh.read("xm.assignment").collect()} == {1, 2}
    # batch 2: a near-dup (dropped -> never indexed) + a new row
    stats = media_ingest_apply(
        wh, "z.corpus",
        _media(spark, [(3, "image", _edited(img_a)), (4, "image", _noise(53, 700))]),
        dupes_table="z.dupes", embed_index="xm",
    )
    assert stats["n_cross_dups"] == 1 and stats["n_new"] == 1
    ids = {r["vec_id"] for r in wh.read("xm.assignment").collect()}
    assert ids == {1, 2, 4}  # 3 was dropped, never indexed
    # retry of the same apply appends nothing (idempotent by id)
    media_ingest_apply(
        wh, "z.corpus",
        _media(spark, [(4, "image", _noise(53, 700))]), embed_index="xm",
    )
    assert wh.read("xm.assignment").count() == 3
    # the maintained index answers: the dropped copy's embedding finds
    # its surviving canonical as the top hit
    q = embed_media(
        _media(spark, [(99, "image", _edited(img_a))]), dims=32
    ).select(F.col("media_id").alias("query_id"), "embedding")
    hits = ivf_search_frame(wh, "xm", q, k=1, n_probes=10).collect()
    assert hits and hits[0]["neighbor_id"] == 1
    # a missing index fails loudly before any state changes
    import pytest

    with pytest.raises(Exception):
        media_ingest_apply(
            wh, "z2.corpus", _media(spark, [(9, "image", img_b)]),
            embed_index="nope",
        )
    assert not wh.exists("z2.corpus")


def test_zone_fed_contrastive_build(spark, tmp_path):
    """The full incremental story in one call (r15): the zone's OWN
    state -- its corpus, its dup-cluster lineage, its maintained
    embed index -- feeds build_contrastive_media_text_set with zero
    corpus-scale re-hash and zero index rebuild: a caption pointing
    at a DROPPED near-dup re-points to the surviving canonical, the
    canonical's cluster never appears among that caption's negatives,
    and no fresh index tables materialize."""
    from pyspark.sql import functions as F

    from pg_auto_dw_spark.functions.multimodal import (
        build_contrastive_media_text_set,
        embed_media,
    )
    from pg_auto_dw_spark.functions.similarity import build_ivf_index
    from pg_auto_dw_spark.streaming.jobs import media_zone_cluster_assignments

    wh = Warehouse(spark, str(tmp_path / "wh"))
    img_a, img_b = _noise(61, 700), _noise(62, 700)
    batch1 = _media(spark, [(1, "image", img_a), (2, "image", img_b)])
    vecs = embed_media(batch1, dims=32).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )
    build_ivf_index(wh, vecs, "cx", stride=2, dims=32)
    media_ingest_apply(
        wh, "zc.corpus", batch1, dupes_table="zc.dupes", embed_index="cx"
    )
    stats = media_ingest_apply(
        wh, "zc.corpus",
        _media(spark, [(3, "image", _edited(img_a)),
                       (4, "image", _noise(63, 700))]),
        dupes_table="zc.dupes", embed_index="cx",
    )
    assert stats["n_cross_dups"] == 1 and stats["n_new"] == 1
    clusters = media_zone_cluster_assignments(wh, "zc.corpus", "zc.dupes")
    docs = spark.createDataFrame(
        [(101, "a photo of noisy texture alpha"),
         (103, "another view of noisy texture alpha"),
         (104, "a completely different pattern")],
        "doc_id bigint, text string",
    )
    links = spark.createDataFrame(
        [(1, 101), (3, 103), (4, 104)], "media_id bigint, doc_id bigint"
    )
    corpus = wh.read("zc.corpus").select("media_id", "media_type", "payload")
    out = build_contrastive_media_text_set(
        wh, corpus, docs, links,
        media_types=("image",), semantic_threshold=None,
        media_clusters=clusters, media_index="cx",
        dims=32, k=4, n_negatives=2, neg_margin=None,
        val_fraction=0.001,  # tiny: keep the 3 pairs on the train side
    ).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # the caption of the DROPPED copy re-pointed to the canonical
    assert by_doc[103]["media_id"] == 1
    # zero rebuild: the facade's default index name never materialized
    assert not wh.exists("contrastive_media.codebook")
    for r in out:
        negs = r["negative_media_ids"]
        if r["split"] != "train" or negs is None:
            continue
        assert r["media_id"] not in negs
        if r["media_id"] == 1:  # cluster {1, 3}: neither may be mined
            assert 1 not in negs and 3 not in negs
