"""Real-codec boundary of the multimodal decode dispatch: synthetic
payloads always take the deterministic stub; real encoded images take
PIL when installed and raise the documented boundary error when not --
through the SAME mapInPandas contract either way."""

import pytest

from pg_auto_dw_spark.functions import multimodal as mm


def test_magic_sniffer():
    assert mm._is_encoded_image(b"\x89PNG\r\n\x1a\n" + b"x" * 8)
    assert mm._is_encoded_image(b"\xff\xd8\xff\xe0rest")
    assert not mm._is_encoded_image(b"plain text payload")
    assert not mm._is_encoded_image(None)
    assert not mm._is_encoded_image(b"")


def test_synthetic_payload_always_stub_decodes():
    d = mm._decode("image", b"some synthetic text bytes")
    assert d["n_frames"] == 1 and d["width"] is not None


def test_real_image_without_codec_raises():
    if mm._HAVE_PIL:
        pytest.skip("PIL installed; boundary error not reachable")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._decode("image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


@pytest.mark.skipif(not mm._HAVE_PIL, reason="Pillow not installed")
def test_real_png_decodes_through_mapinpandas(spark):
    """A real PNG goes through decode_media/resize_media with true
    dimensions and true pixel bytes -- same schemas, same plumbing."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 20), (255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()

    media = spark.createDataFrame(
        [(1, "image", bytearray(png), None)], mm.MEDIA_SCHEMA
    )
    decoded = mm.decode_media(media).collect()[0]
    assert (decoded["width"], decoded["height"], decoded["n_frames"]) == (40, 20, 1)

    resized = mm.resize_media(media, max_side=10).collect()[0]
    assert (resized["out_width"], resized["out_height"]) == (10, 5)
    assert len(resized["thumbnail"]) == 10 * 5 * 3
    assert bytes(resized["thumbnail"]) != b"\x00" * 150  # real pixels
