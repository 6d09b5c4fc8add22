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
