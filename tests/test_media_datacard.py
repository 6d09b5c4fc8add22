"""media_datacard: the media corpus's one-pass ANALYZE surface
(functions/multimodal.py, r14) -- per-type counts and byte stats with
the families' NULL-content convention."""

from pg_auto_dw_spark.functions.multimodal import media_datacard


def test_media_datacard_counts_and_null_convention(spark):
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"abcd"), "{}"),
            (2, "image", bytearray(b""), None),      # empty -> null-class
            (3, "image", None, "{}"),                # NULL  -> null-class
            (4, "audio", bytearray(b"abcdefgh"), None),
            (5, "audio", bytearray(b"abcd"), "{}"),
            (6, "audio", bytearray(b"abcd"), "{}"),  # same size as 5
        ],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    rows = {r["media_type"]: r for r in media_datacard(media).collect()}
    img, aud = rows["image"], rows["audio"]
    assert (img["n_media"], img["n_null_payloads"], img["n_with_meta"]) == (3, 2, 2)
    assert (img["total_bytes"], img["min_bytes"], img["max_bytes"]) == (4, 4, 4)
    assert img["avg_bytes"] == 4.0 and img["n_distinct_sizes"] == 1
    assert (aud["n_media"], aud["n_null_payloads"]) == (3, 0)
    assert (aud["total_bytes"], aud["min_bytes"], aud["max_bytes"]) == (16, 4, 8)
    assert abs(aud["avg_bytes"] - 16 / 3) < 1e-12
    assert aud["n_distinct_sizes"] == 2


def test_media_datacard_drift_flags_and_deltas(spark):
    """media_datacard_drift (r15): integer old/new/delta fields per
    media_type, relative-move flag at rel_threshold, and the
    one-side-missing always-flags rule for a disappearing modality."""
    from pg_auto_dw_spark.functions.multimodal import media_datacard_drift

    old = spark.createDataFrame(
        [
            (1, "image", bytearray(b"abcd"), "{}"),
            (2, "image", bytearray(b"efgh"), None),
            (3, "audio", bytearray(b"ijkl"), "{}"),
        ],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    new = spark.createDataFrame(
        [
            # image: stable counts (2 -> 2, bytes 8 -> 8): no drift
            (1, "image", bytearray(b"abcd"), "{}"),
            (2, "image", bytearray(b"efgh"), "{}"),
            # audio gone entirely; video appears
            (4, "video", bytearray(b"mnopqrst"), None),
        ],
        "media_id bigint, media_type string, payload binary, meta string",
    )
    rows = {r["media_type"]: r for r in media_datacard_drift(old, new).collect()}
    assert set(rows) == {"image", "audio", "video"}
    img = rows["image"]
    assert not img["drifted"]
    assert (img["n_media_old"], img["n_media_new"], img["n_media_delta"]) == (2, 2, 0)
    # n_with_meta moved 1 -> 2 but is deliberately NOT a flag field
    assert (img["n_with_meta_old"], img["n_with_meta_new"]) == (1, 2)
    assert rows["audio"]["drifted"] and rows["audio"]["n_media_new"] is None
    assert rows["video"]["drifted"] and rows["video"]["n_media_old"] is None
    assert rows["video"]["n_media_delta"] == 1
    assert rows["audio"]["total_bytes_delta"] == -4


def test_synth_media_null_meta_discriminates(spark, sf_dir):
    """r14 VERDICT What's wrong #3: synth_media_df plants NULL meta on
    every 11th row, so n_with_meta < n_media for at least one type."""
    from pg_auto_dw_spark.functions.multimodal import (
        media_datacard,
        synth_media_df,
    )
    from pg_auto_dw_spark.sources import load_table

    media = synth_media_df(load_table(spark, sf_dir, "documents"))
    rows = media_datacard(media).collect()
    assert any(r["n_with_meta"] < r["n_media"] for r in rows)
