"""The _pil_grids real-decode branch under a strict fake PIL (r13
VERDICT directive 6, adapted: the sandbox has no Pillow and no
network, so the real-PIL leg stays environmental -- but the DISPATCH
contract is executable with a minimal in-test PIL stand-in).

Scope note: Spark's Python workers are separate processes that
re-import the module, so a driver-side monkeypatch never reaches a
mapInPandas body running under Spark. These tests therefore invoke
the pure functions and the Arrow batch bodies DIRECTLY (plain
iterators over pandas frames) -- the exact code the workers run,
minus the process boundary. What they pin:

1. a decodable payload takes the real-decode branch (grids = real
   pixels, not the byte-average stub),
2. a magic-sniff FALSE POSITIVE (payload starting 'BM' that the codec
   rejects) falls back to the stub instead of killing the task -- the
   r13-hardened branch that had never executed with a codec present,
3. both image-grid consumers (_image_small_grid and the perceptual
   path) route through the SAME dispatch, so real-vs-stub can never
   drift between the family hashes and the zone's phash ledger.
"""

import io
import struct

import pandas as pd
import pytest

from pg_auto_dw_spark.functions import multimodal as mm

# --- a strict fake PIL: decodes ONLY our framed grayscale format ----
# payload = b'BM' + magic u16 + width u16 + height u16 + w*h pixel bytes
_FAKE_MAGIC = 0xA55A


def _encode_fake_bmp(w: int, h: int, pixels: list[int]) -> bytes:
    assert len(pixels) == w * h
    return b"BM" + struct.pack("<HHH", _FAKE_MAGIC, w, h) + bytes(pixels)


class _FakeImg:
    def __init__(self, w, h, px):
        self.width, self.height, self._px = w, h, px
        self.n_frames = 1

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, size):
        w2, h2 = size
        # deterministic nearest-neighbor stand-in for PIL's resampling
        out = [
            self._px[(y * self.height // h2) * self.width + (x * self.width // w2)]
            for y in range(h2)
            for x in range(w2)
        ]
        return _FakeImg(w2, h2, out)

    def getdata(self):
        return list(self._px)


class _FakePIL:
    @staticmethod
    def open(buf: io.BytesIO):
        data = buf.read()
        if len(data) < 8 or data[:2] != b"BM":
            raise OSError("not a fake BMP")
        magic, w, h = struct.unpack("<HHH", data[2:8])
        if magic != _FAKE_MAGIC or len(data) != 8 + w * h:
            raise OSError("corrupt fake BMP")  # strict: text never decodes
        return _FakeImg(w, h, list(data[8:]))


@pytest.fixture
def fake_pil(monkeypatch):
    monkeypatch.setattr(mm, "_PILImage", _FakePIL)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)


# a 18x16 gradient image: every pixel distinct enough for real hashes
VALID = _encode_fake_bmp(18, 16, [(x * 13 + y * 7) % 256 for y in range(16) for x in range(18)])
FALSE_POSITIVE = b"BMarket report: shares of the miller rose..." + b"x" * 64


def test_real_decode_branch_produces_pixel_grids(fake_pil):
    grids = mm._pil_grids(VALID, [(9, 8), (32, 32)])
    assert grids is not None and len(grids[0]) == 72 and len(grids[1]) == 1024
    # real pixels, not the byte-average stub over the payload bytes
    assert grids[0] != mm._gray_grid(VALID, 9, 8)
    # and the consumer-facing small grid is exactly the dispatch output
    assert mm._image_small_grid(VALID) == grids[0]


def test_false_positive_falls_back_to_stub(fake_pil):
    assert mm._pil_grids(FALSE_POSITIVE, [(9, 8)]) is None
    assert mm._image_small_grid(FALSE_POSITIVE) == mm._gray_grid(
        FALSE_POSITIVE, 9, 8
    )


def test_consumers_cannot_drift(fake_pil):
    """The family dHash and the zone phash grid come from ONE dispatch:
    hash the same payload through both consumer entry points and the
    underlying 9x8 grid is identical (real for decodable, stub for the
    false positive)."""
    for payload in (VALID, FALSE_POSITIVE):
        small = mm._image_small_grid(payload)
        via_dispatch = mm._pil_grids(payload, [(9, 8)])
        expect = via_dispatch[0] if via_dispatch is not None else mm._gray_grid(
            payload, 9, 8
        )
        assert small == expect
        assert isinstance(mm._dhash64(small), int)  # hashable either way


def test_decode_media_batch_body_uses_real_dims(fake_pil):
    """The mapInPandas BODY (invoked directly, same code the workers
    run): a decodable payload reports its true dimensions; the false
    positive raises nothing and stub-decodes."""
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "media_type": ["image", "image"],
            "payload": [VALID, FALSE_POSITIVE],
            "meta": [None, None],
        }
    )
    out = pd.concat(list(mm.decode_media_batch(iter([pdf]))))
    byid = out.set_index("media_id")
    assert (byid.loc[1, "width"], byid.loc[1, "height"]) == (18, 16)
    # false positive: stub fallback dims (16 + n % 624 ...), no crash
    n = len(FALSE_POSITIVE)
    assert (byid.loc[2, "width"], byid.loc[2, "height"]) == (
        16 + n % 624, 16 + (n * 7) % 464
    )


def test_decode_stats_path_false_positive_falls_back(fake_pil):
    """The r14 fix the fake-PIL tests surfaced: the stats path
    (_decode) now shares the grid path's false-positive fallback --
    a sniffed payload the codec rejects stub-decodes instead of
    killing the Arrow task. Without a codec, the documented boundary
    error still stands (test_multimodal_codec.py pins that leg)."""
    d = mm._decode("image", FALSE_POSITIVE)
    assert d == mm._fake_decode("image", FALSE_POSITIVE)
